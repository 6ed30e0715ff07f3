"""Java/Hive UDF entry point (`CREATE [TEMPORARY] FUNCTION ... USING JAR`)
— the reference executes Hive UDF jars natively
(be/src/exprs/hive-udf-call.cc:335, planner/fe .../hive/executor/); real
deployments migrate Hive UDF jars constantly, so the Spark engine must
accept the same jars.

Spark wraps Hive UDF classes only through the Hive session catalog
(`enableHiveSupport()`), a static conf that cannot be flipped on the shared
test JVM — so this test builds the jar with the in-container JDK and drives
a dedicated hive-enabled session in a subprocess.  No prebuilt binary is
checked in: the UDF compiles from source at test time against the
hive-exec jar that ships inside pyspark/jars."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

import pyspark

JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")


def _hive_exec_jar() -> str | None:
    for f in os.listdir(JARS):
        if f.startswith("hive-exec-"):
            return os.path.join(JARS, f)
    return None


@pytest.mark.skipif(shutil.which("javac") is None, reason="no JDK")
@pytest.mark.skipif(_hive_exec_jar() is None, reason="no hive-exec jar")
def test_hive_udf_using_jar(tmp_path):
    src = tmp_path / "MisRepeatUdf.java"
    src.write_text(
        textwrap.dedent(
            """
            import org.apache.hadoop.hive.ql.exec.UDF;
            public class MisRepeatUdf extends UDF {
              public String evaluate(String s, int n) {
                if (s == null) return null;
                return s.repeat(Math.max(n, 0));
              }
            }
            """
        )
    )
    subprocess.run(
        ["javac", "-cp", _hive_exec_jar(), str(src)], check=True, cwd=tmp_path
    )
    jar = tmp_path / "mis_udf.jar"
    subprocess.run(
        ["jar", "cf", str(jar), "MisRepeatUdf.class"], check=True, cwd=tmp_path
    )

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
            spark.sql("CREATE TEMPORARY FUNCTION mis_repeat AS 'MisRepeatUdf' "
                      "USING JAR '{jar}'")
            rows = spark.sql(
                "SELECT mis_repeat('ab', 3) AS r, mis_repeat(NULL, 2) AS n").collect()
            assert rows[0].r == "ababab" and rows[0].n is None, rows
            # and through a real column, executor-side
            got = spark.sql(
                "SELECT sum(length(mis_repeat(CAST(id AS STRING), 2))) AS t "
                "FROM range(100)").collect()[0].t
            assert got == sum(len(str(i)) * 2 for i in range(100)), got
            print("HIVE_UDF_OK")
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
    assert "HIVE_UDF_OK" in out.stdout
