"""Observable error-path contracts for the reference's scanner/UDF error
files (functional-query *-errors/continue-on-error/invalid_header/
test-unmatched-schema/insert_parquet_invalid_codec — see
WORKLOAD_MANIFEST.md "Engine-infra replaced by Spark/JVM").

The reference fault-injects its NATIVE runtime; those components don't
exist here. What a user still observes — and what these tests pin — is
the contract at the seams this engine owns: bad input either fails
LOUDLY, skips per an explicit option, or nulls per the declared mode;
never a silent wrong answer. Each test names the reference file whose
observable behavior it covers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from minimised_impala_spark.sources.formats import (
    read_parquet,
    read_sequencefile,
    read_text,
    write_parquet,
)


# --------------------------------------------------------------------------
# parquet-continue-on-error.test: the reference scanner counts corrupt
# pages and continues under abort_on_error=0, aborts under =1. Spark's
# seam: spark.sql.files.ignoreCorruptFiles — default FAIL LOUDLY on a
# corrupt footer, skip the file when the option is set.
def test_corrupt_parquet_fails_loud_then_skips_with_option(spark, tmp_path):
    good = str(tmp_path / "t")
    write_parquet(spark.range(10).selectExpr("id", "id * 2 AS v"), good)
    # plant a corrupt .parquet alongside the good files
    bad = tmp_path / "t" / "part-corrupt.parquet"
    bad.write_bytes(b"PAR1 this is not a parquet file")
    df = read_parquet(spark, good)
    with pytest.raises(Exception) as ei:
        df.count()
    assert "parquet" in str(ei.value).lower() or "footer" in str(ei.value).lower()
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert read_parquet(spark, good).count() == 10
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")


# --------------------------------------------------------------------------
# test-unmatched-schema.test: reading files under a declared schema whose
# types don't match. Parquet hard-conflicts (bigint file vs int decl)
# must FAIL with a schema message, not coerce silently.
def test_parquet_unmatched_schema_fails_loud(spark, tmp_path):
    path = str(tmp_path / "u")
    write_parquet(spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s"), path)
    df = spark.read.schema("id bigint, s double").parquet(path)
    with pytest.raises(Exception):
        df.collect()


# --------------------------------------------------------------------------
# invalid_header.test + the text scanner's parse-error counters
# (hdfs-text-scanner error tolerance): a malformed numeric field nulls
# under PERMISSIVE, drops the row under DROPMALFORMED, raises under
# FAILFAST — the three dispositions the reference spreads across
# abort_on_error/max_errors.
def test_text_malformed_row_three_modes(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("1,alpha\nnot_an_int,beta\n3,gamma\n")
    schema = "id int, name string"
    permissive = read_text(spark, str(p), schema=schema).collect()
    assert len(permissive) == 3
    assert sorted(r["id"] for r in permissive if r["id"] is not None) == [1, 3]
    dropped = read_text(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]
    with pytest.raises(Exception):
        read_text(spark, str(p), schema=schema, mode="FAILFAST").collect()


# --------------------------------------------------------------------------
# udf-errors.test / udf-init-close.test: a failing UDF surfaces the
# Python exception message to the caller (the reference surfaces UDF
# errors through its error log with the same fail-the-query default).
def test_python_udf_error_propagates_with_message(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def boom(s):
        raise RuntimeError("boom-marker-xyz")

    df = spark.range(4).select(boom(F.col("id")).alias("x"))
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "boom-marker-xyz" in str(ei.value)


# --------------------------------------------------------------------------
# insert_parquet_invalid_codec.test: an unsupported compression codec is
# rejected at write planning, loudly, before any data moves.
def test_invalid_parquet_codec_rejected(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(Exception) as ei:
        df.write.option("compression", "no_such_codec").parquet(
            str(tmp_path / "out")
        )
    assert "codec" in str(ei.value).lower() or "compression" in str(ei.value).lower()


# --------------------------------------------------------------------------
# hdfs-sequence-scan-errors.test: garbage bytes under a SequenceFile
# scan raise (the header magic check), never parse as empty success.
def test_sequencefile_garbage_raises(spark, tmp_path):
    p = tmp_path / "garbage.seq"
    p.write_bytes(b"\x00\x01NOT-A-SEQUENCEFILE\xff" * 10)
    with pytest.raises(Exception):
        read_sequencefile(spark, str(p), "id bigint, v string").collect()


# --------------------------------------------------------------------------
# hdfs-scan-node-errors.test: a scan over a missing path is an analysis
# error naming the path, not an empty result.
def test_missing_path_is_loud_analysis_error(spark, tmp_path):
    missing = str(tmp_path / "never_written")
    with pytest.raises(AnalysisException):
        read_parquet(spark, missing).collect()
