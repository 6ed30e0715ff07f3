"""Legacy Hadoop format coverage — the reference's SequenceFile/RCFile
scanners (be/src/exec/hdfs-sequence-scanner.h:156 497 LoC,
hdfs-rcfile-scanner.h:231 572 LoC; writer hdfs-sequence-table-writer.h:38).

Two Spark access paths:
- plain session: (key, JSON) SequenceFile via the RDD bridge
  (sources/formats.py read/write_sequencefile);
- hive-enabled session: real Hive-serde SequenceFile AND RCFile tables via
  ``STORED AS`` — driven in a subprocess because the catalog
  implementation is a static conf on the shared test JVM.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from minimised_impala_spark.sources import formats
from minimised_impala_spark.tables import load_table


def test_sequencefile_roundtrip(spark, sf_dir, tmp_path):
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    p = str(tmp_path / "sup_seq")
    formats.write_sequencefile(sup, p, key_col="s_suppkey")
    back = formats.read_sequencefile(
        spark,
        p,
        "s_name string, s_nationkey int, s_acctbal double",
    )
    orig = sup.select("s_name", "s_nationkey", "s_acctbal")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))
    assert dict(back.dtypes) == dict(orig.dtypes)


def test_hive_sequencefile_and_rcfile_tables(tmp_path):
    driver = tmp_path / "drive.py"
    driver.write_text(
        textwrap.dedent(
            f"""
            from pyspark.sql import SparkSession
            spark = (SparkSession.builder.master("local[2]")
                     .config("spark.ui.enabled", "false")
                     .config("spark.sql.warehouse.dir", r"{tmp_path}/wh")
                     .config("spark.driver.extraJavaOptions",
                             r"-Dderby.system.home={tmp_path}/derby")
                     .enableHiveSupport().getOrCreate())
            spark.sparkContext.setLogLevel("ERROR")
            spark.sql("CREATE TABLE t_seq (k BIGINT, s STRING) STORED AS SEQUENCEFILE")
            spark.sql("CREATE TABLE t_rc  (k BIGINT, s STRING) STORED AS RCFILE")
            spark.sql("INSERT INTO t_seq SELECT id, CONCAT('v', id) FROM range(100)")
            spark.sql("INSERT INTO t_rc  SELECT id, CONCAT('v', id) FROM range(100)")
            for t in ("t_seq", "t_rc"):
                got = spark.sql(
                    f"SELECT count(*) AS n, sum(k) AS s, min(s) AS mn FROM {{t}}"
                ).collect()[0]
                assert (got.n, got.s, got.mn) == (100, 4950, "v0"), (t, got)
                fmt = [r.data_type for r in spark.sql(f"DESCRIBE FORMATTED {{t}}").collect()
                       if r.col_name.strip() == "InputFormat"][0]
                expect = "Sequence" if t == "t_seq" else "RCFile"
                assert expect in fmt, (t, fmt)
            print("LEGACY_FORMATS_OK")
            """
        )
    )
    out = subprocess.run(
        [sys.executable, str(driver)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=tmp_path,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "LEGACY_FORMATS_OK" in out.stdout
