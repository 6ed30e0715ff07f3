"""File-format sources and sinks — the reference's scanner/writer family
(SURVEY §2.1):

- delimited text with escaping + compression
  (be/src/exec/hdfs-text-scanner.h:30, delimited-text-parser.cc:293,
  writer hdfs-text-table-writer.h:40) → ``read_text``/``write_text``
  over Spark's csv source;
- parquet (be/src/exec/hdfs-parquet-scanner.h:282, writer
  hdfs-parquet-table-writer.h:49) → vectorized built-in;
- avro with schema resolution (be/src/exec/hdfs-avro-scanner.h:81) →
  ``spark.read.format("avro")``, gated: the spark-avro jar may be absent
  in offline deployments;
- json (no reference analogue; standard Spark source, included for
  pipeline completeness);
- partitioned table sink (INSERT path, be/src/exec/hdfs-table-sink.h:122)
  → ``write_partitioned``.

Every reader returns a plain DataFrame so all downstream operators are
source-agnostic, exactly like the reference's scanner→exec-node seam.

Scale notes: compression codec choice controls scan parallelism — gzip is
NOT splittable (one task per file; the reference had the same constraint,
hdfs-text-scanner.h compression notes), so large text datasets should use
bzip2 (splittable), many smaller gzip files, or parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    escape: str = "\\",
    quote: str = '"',
    header: bool = False,
    compression: str | None = None,
    mode: str = "PERMISSIVE",
    encoding: str = "UTF-8",
    null_value: str | None = None,
) -> DataFrame:
    """Delimited-text scan (csv source). Infers schema when not given —
    the reference instead required declared schemas (schema-on-read from
    the metastore); pass ``schema`` for parity-exact typing.

    ``mode`` controls malformed-row handling like the reference's text
    scanner error tolerance (hdfs-text-scanner.h parse-error counters):
    PERMISSIVE nulls unparseable fields, DROPMALFORMED skips bad rows,
    FAILFAST raises. ``encoding`` covers non-UTF8 corpora (the
    reference's delimited-latin-text.test reads ISO-8859-1).
    ``null_value`` sets an explicit NULL sentinel — pass r'\\N' for the
    reference's Hive-convention text tables (functional-query
    null_data.test); left None, Spark's default applies (empty field →
    NULL), matching this engine's own write_text round trip."""
    reader = (
        spark.read.option("sep", sep)
        .option("escape", escape)
        .option("quote", quote)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("encoding", encoding)
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_text(
    df: DataFrame,
    path: str,
    sep: str = ",",
    escape: str = "\\",
    header: bool = False,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    w = (
        df.write.mode(mode)
        .option("sep", sep)
        .option("escape", escape)
        .option("header", str(header).lower())
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame, path: str, compression: str = "snappy", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("compression", compression).parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is on the classpath."""
    try:
        spark.read.format("avro").load("/nonexistent-probe-path")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Missing-source errors name the format; path errors mean the
        # source itself resolved.
        return "AVRO" not in msg.upper() or "PATH_NOT_FOUND" in msg
    return True


def read_avro(spark: SparkSession, path: str, avro_schema: str | None = None) -> DataFrame:
    """Avro scan with optional reader-schema resolution
    (hdfs-avro-scanner.h:81 semantics: reader schema may add defaulted
    fields, drop writer fields, reorder, and promote types). Uses the
    spark-avro datasource when on the classpath; otherwise the pure-Python
    container codec (sources/avro_py.py: binaryFile + mapInPandas decode,
    cross-validated against Apache Avro Java in tests/test_avro.py)."""
    if avro_available(spark):
        reader = spark.read.format("avro")
        if avro_schema is not None:
            reader = reader.option("avroSchema", avro_schema)
        return reader.load(path)
    from minimised_impala_spark.sources.avro_py import read_avro_fallback

    return read_avro_fallback(spark, path, reader_schema=avro_schema)


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> None:
    """Avro sink: spark-avro when present, else the pure-Python
    one-container-file-per-task fallback."""
    spark = df.sparkSession
    if avro_available(spark):
        df.write.mode("overwrite").format("avro").save(path)
        return
    from minimised_impala_spark.sources.avro_py import write_avro_fallback

    write_avro_fallback(df, path, codec=codec)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Dynamic-partitioned sink: one directory per partition-key value —
    the reference's HdfsTableSink partition layout
    (be/src/exec/hdfs-table-sink.h:122, HdfsPartition.java)."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_sequencefile(df: DataFrame, path: str, key_col: str | None = None) -> None:
    """SequenceFile sink (the reference's legacy-format writer family,
    hdfs-sequence-table-writer.h:38): rows serialize as (key, JSON) pairs.
    JSON encoding runs JVM-side (to_json); the RDD hop is the only access
    path PySpark exposes for SequenceFile — acceptable for a legacy-format
    bridge (modern tables use parquet/ORC; see SURVEY §2.1). For
    Hive-managed SequenceFile/RCFile *tables*, use a hive-enabled session
    and ``STORED AS SEQUENCEFILE/RCFILE`` (tests/test_legacy_formats.py)."""
    cols = [c for c in df.columns if c != key_col]
    key = F.col(key_col).cast("string") if key_col else F.monotonically_increasing_id().cast("string")
    pairs = df.select(key.alias("k"), F.to_json(F.struct(*cols)).alias("v"))
    pairs.rdd.map(tuple).saveAsSequenceFile(path)


def read_sequencefile(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """SequenceFile scan (hdfs-sequence-scanner.h:156): values are JSON
    rows; schema is required (schema-on-read, as the reference's metastore
    supplied it)."""
    from pyspark.sql.types import StringType

    values = spark.sparkContext.sequenceFile(path).values()
    raw = spark.createDataFrame(values, StringType())
    return raw.select(F.from_json("value", schema).alias("r")).select("r.*")


def read_mixed_partitions(
    spark: SparkSession,
    partitions: list[tuple[str, str, dict]],
    schema: StructType | str,
) -> DataFrame:
    """Mixed-format table scan: the reference's HdfsScanNode dispatches a
    per-PARTITION scanner chosen by the partition's stored format
    (be/src/exec/hdfs-scan-node.h; exercised by functional-query
    mixed-format.test over alltypesmixedformat). Spark has no single-table
    equivalent without a Hive metastore, so this reads each partition with
    its format's reader and unions by NAME under one declared schema —
    downstream operators stay source-agnostic, exactly like the
    scanner→exec-node seam.

    ``partitions``: (path, format, partition_values) triples; formats:
    parquet | text | json | orc | sequencefile. Partition-key columns from
    ``partition_values`` are attached as literals (the reference stores
    them in the partition metadata, not the files).

    Scale notes: each branch keeps its own pushdown/pruning; the union is
    plan-level only (no shuffle). Partition pruning = pruning the list
    before calling (the metastore's job in the reference).
    """
    readers = {
        "parquet": lambda p: read_parquet(spark, p),
        "text": lambda p: read_text(spark, p, schema=schema),
        "json": lambda p: read_json(spark, p, schema=schema),
        "orc": lambda p: read_orc(spark, p),
        "sequencefile": lambda p: read_sequencefile(spark, p, schema),
    }
    if not partitions:
        # Fully-pruned scan (every partition eliminated before the call,
        # the metastore-pruning analogue): an empty relation of the
        # declared schema, same as the reference's pruned HdfsScanNode.
        return spark.createDataFrame([], schema)
    parts = []
    for path, fmt, pvals in partitions:
        if fmt not in readers:
            raise ValueError(f"unsupported partition format: {fmt}")
        df = readers[fmt](path)
        for k, v in pvals.items():
            df = df.withColumn(k, F.lit(v))
        parts.append(df)
    out = parts[0]
    for df in parts[1:]:
        # allowMissingColumns: partitions may carry differing
        # partition-key sets (keys absent in a branch read as NULL —
        # the reference's partition-metadata default).
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — Spark-native columnar alternative (fills the role the
    legacy RCFile scanner held in the reference's format matrix,
    be/src/exec/hdfs-rcfile-scanner.h:231, with a modern format)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def optimize_layout(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    parquet_block_bytes: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-cluster a dataset on ``cluster_cols`` — the data-layout lever
    for 100 TB scans the reference exposed via sorted insert + partition
    design (HdfsTableSink + planner partition pruning): range-repartition
    so each output file owns a contiguous key slice, then sort within
    files so every parquet row group's min/max stats are tight. Selective
    filters on the clustered key then prune whole files AND row groups at
    scan time (pinned by tests/test_layout.py: clustered scan reads a
    fraction of the unclustered one's rows under the same pushed filter).

    ``parquet_block_bytes`` shrinks row groups (test-scale knob; leave None
    in production for the 128 MiB default)."""
    w = df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
        *cluster_cols
    )
    writer = w.write.mode(mode)
    if parquet_block_bytes is not None:
        writer = writer.option("parquet.block.size", str(parquet_block_bytes))
    writer.parquet(path)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — rewrite a directory of many small files
    into ~target-size files. The operational fix for the classic 100 TB
    failure mode: millions of tiny files from over-parallel or incremental
    writes destroy scan planning (footer reads) and shuffle locality.

    Returns the number of output files. The rewrite goes to a staging
    directory first, then a two-rename swap. The swap window (between the
    two renames) is the only instant the dataset is not at ``path``; a
    crash there leaves the complete data at ``<path>._compact_old``, and
    stale staging/backup directories from any earlier crash are cleaned
    up on the next invocation, so compaction is always re-runnable and no
    committed data is ever deleted before its replacement exists.
    """
    import math
    import os
    import shutil

    staging = path.rstrip("/") + "._compact_staging"
    backup = path.rstrip("/") + "._compact_old"
    # recover from a previous crash: a leftover backup means the swap was
    # interrupted — restore it if the data dir is missing, else drop it.
    if os.path.exists(backup):
        if not os.path.exists(path):
            os.rename(backup, path)
        else:
            shutil.rmtree(backup)
    if os.path.exists(staging):
        shutil.rmtree(staging)

    df = spark.read.format(fmt).load(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df.repartition(n_out).write.mode("overwrite").format(fmt).save(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n_out


def _spread8(c):
    """Spread the low 8 bits of ``c`` into the even bit positions of a
    16-bit word (classic Morton-code magic numbers)."""
    from pyspark.sql import functions as F

    c = c.bitwiseAND(F.lit(0xFF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x3333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x5555))
    return c


def zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    parquet_block_bytes: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustering on TWO columns — the layout lever
    when scans filter on more than one dimension: single-column range
    clustering (optimize_layout) makes row-group stats tight on ONE key
    and useless on the second; interleaving the bits of both keys' bucket
    numbers keeps every row group confined to a small rectangle of
    (a, b)-space, so min/max pruning bites on BOTH predicates
    (tests/test_layout.py pins z-ordered < single-key scanned rows for a
    2-dim predicate). Buckets here are equi-width over the driver-fetched
    min/max (one tiny agg — scale-free); production layouts over skewed
    keys should bucket by sampled quantiles instead, same interleave."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_a).cast("double").alias("amn"),
        F.max(col_a).cast("double").alias("amx"),
        F.min(col_b).cast("double").alias("bmn"),
        F.max(col_b).cast("double").alias("bmx"),
    ).collect()[0]

    if stats["amn"] is None or stats["bmn"] is None:
        # Empty (or all-NULL-key) input: no min/max to bucket on — write
        # the frame as-is, mirroring optimize_layout's empty behavior,
        # instead of TypeError on (None - None) below (ADVICE r4).
        writer = df.write.mode(mode)
        if parquet_block_bytes is not None:
            writer = writer.option("parquet.block.size", str(parquet_block_bytes))
        writer.parquet(path)
        return

    def bucket(col: str, mn: float, mx: float):
        span = (mx - mn) or 1.0
        return F.least(
            F.lit(255),
            F.floor((F.col(col).cast("double") - mn) / span * 256).cast("int"),
        )

    z = _spread8(bucket(col_a, stats["amn"], stats["amx"])).bitwiseOR(
        F.shiftleft(_spread8(bucket(col_b, stats["bmn"], stats["bmx"])), 1)
    )
    w = (
        df.withColumn("__zcode", z)
        .repartitionByRange(n_files, F.col("__zcode"))
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
    )
    writer = w.write.mode(mode)
    if parquet_block_bytes is not None:
        writer = writer.option("parquet.block.size", str(parquet_block_bytes))
    writer.parquet(path)
