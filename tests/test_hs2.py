"""JDBC endpoint smoke test (entry point B — the reference's HS2 server,
be/src/service/impala-hs2-server.cc:716).

Runs in a dedicated subprocess because HiveThriftServer2 has no stop API
short of JVM exit: the child starts its own SparkSession, attaches the
thrift server via minimised_impala_spark.hs2.start_hs2, then drives a
real JDBC client (beeline, from the baked-in hive-jdbc jars) through a
query over an engine temp view — the full ExecuteStatement/FetchResults
protocol, not a loopback shortcut.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

_BEELINE = shutil.which("beeline") or "/opt/spark/bin/beeline"

_CHILD = textwrap.dedent(
    """
    import subprocess, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from minimised_impala_spark.hs2 import start_hs2

    spark = (SparkSession.builder.master("local[4]")
             .appName("mis-hs2-smoke")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.hive.thriftServer.singleSession", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet") \\
         .createOrReplaceTempView("nation")
    port = start_hs2(spark, port={port})
    out = subprocess.run(
        [{beeline!r}, "-u", f"jdbc:hive2://localhost:{{port}}/default",
         "-n", "anonymous", "--silent=true", "--outputformat=csv2",
         "-e", "SELECT n_regionkey, count(*) AS n FROM nation "
               "GROUP BY n_regionkey ORDER BY n_regionkey"],
        capture_output=True, text=True, timeout=120)
    print("BEELINE_RC", out.returncode)
    print(out.stdout)
    sys.exit(0 if out.returncode == 0 else 1)
    """
)


@pytest.mark.skipif(not os.path.exists(_BEELINE), reason="beeline not on this image")
def test_hs2_jdbc_round_trip(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "hs2_child.py"
    script.write_text(_CHILD.format(repo=repo, port=10241, beeline=_BEELINE))
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "BEELINE_RC 0" in out.stdout
    # 25 nations over 5 regions, 5 each — the JDBC result is the real data.
    body = out.stdout[out.stdout.index("BEELINE_RC") :]
    for region in range(5):
        assert f"{region},5" in body, body
