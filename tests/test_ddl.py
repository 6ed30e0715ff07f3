"""DDL / DML / utility-statement surface tests (SURVEY §2.11 — the
reference grammar's statement list, fe/src/main/cup/sql-parser.cup; DDL
execution path fe/.../service/CatalogOpExecutor.java). All statements are
native Spark SQL; these tests pin the surface the engine promises.

INSERT semantics reference: be/src/exec/hdfs-table-sink.h:122 (INSERT
INTO/OVERWRITE with static and dynamic partitions, partitioned writes)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ddl(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("mis_ddl_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS mis_ddl LOCATION '{loc}'")
    spark.sql("USE mis_ddl")
    yield spark
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS mis_ddl CASCADE")


def test_create_insert_select_drop(ddl):
    ddl.sql("CREATE TABLE t1 (k INT, v STRING) USING parquet")
    ddl.sql("INSERT INTO t1 VALUES (1, 'a'), (2, 'b')")
    ddl.sql("INSERT INTO t1 SELECT 3, 'c'")
    assert ddl.sql("SELECT count(*) n FROM t1").collect()[0]["n"] == 3
    ddl.sql("INSERT OVERWRITE t1 VALUES (9, 'z')")
    assert [r["k"] for r in ddl.sql("SELECT k FROM t1").collect()] == [9]
    ddl.sql("DROP TABLE t1")
    assert not any(r["tableName"] == "t1" for r in ddl.sql("SHOW TABLES").collect())


def test_ctas_and_create_like(ddl, sf_dir):
    ddl.sql(
        f"CREATE TABLE nat USING parquet AS "
        f"SELECT * FROM parquet.`{sf_dir}/nation.parquet`"
    )
    assert ddl.sql("SELECT count(*) n FROM nat").collect()[0]["n"] == 25
    # CREATE TABLE LIKE (schema clone, no data) — reference
    # fe/.../analysis/CreateTableLikeStmt.java
    ddl.sql("CREATE TABLE nat2 LIKE nat")
    assert ddl.sql("SELECT count(*) n FROM nat2").collect()[0]["n"] == 0
    assert ddl.table("nat2").schema == ddl.table("nat").schema


def test_partitioned_insert_static_and_dynamic(ddl, sf_dir):
    """Dynamic-partition INSERT — the HdfsTableSink behavior
    (be/src/exec/hdfs-table-sink.h:122): one output dir per partition key."""
    ddl.sql(
        "CREATE TABLE orders_p (o_orderkey BIGINT, o_totalprice DOUBLE) "
        "USING parquet PARTITIONED BY (status STRING)"
    )
    # dynamic: partition value from the data
    ddl.sql(
        f"INSERT INTO orders_p PARTITION (status) "
        f"SELECT o_orderkey, o_totalprice, o_orderstatus AS status "
        f"FROM parquet.`{sf_dir}/orders.parquet`"
    )
    # static: all rows into one declared partition
    ddl.sql(
        "INSERT INTO orders_p PARTITION (status='X') VALUES (999999999, 1.0)"
    )
    parts = {r[0] for r in ddl.sql("SHOW PARTITIONS orders_p").collect()}
    assert {"status=F", "status=O", "status=X"} <= parts
    # partition pruning: static filter should read only one partition
    plan = (
        ddl.sql("SELECT count(*) FROM orders_p WHERE status = 'X'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert ddl.sql(
        "SELECT count(*) n FROM orders_p WHERE status='X'"
    ).collect()[0]["n"] == 1
    # INSERT OVERWRITE a single partition replaces only that partition
    ddl.sql("INSERT OVERWRITE orders_p PARTITION (status='X') VALUES (1, 2.0)")
    rows = ddl.sql("SELECT o_orderkey FROM orders_p WHERE status='X'").collect()
    assert [r[0] for r in rows] == [1]
    n_f = ddl.sql("SELECT count(*) n FROM orders_p WHERE status='F'").collect()[0]["n"]
    assert n_f > 0


def test_alter_table(ddl):
    ddl.sql("CREATE TABLE alt (a INT) USING parquet")
    ddl.sql("ALTER TABLE alt ADD COLUMNS (b STRING)")
    assert [f.name for f in ddl.table("alt").schema.fields] == ["a", "b"]
    ddl.sql("ALTER TABLE alt SET TBLPROPERTIES ('engine.note'='mis')")
    props = ddl.sql("SHOW TBLPROPERTIES alt").collect()
    assert any(r["key"] == "engine.note" and r["value"] == "mis" for r in props)
    ddl.sql("ALTER TABLE alt RENAME TO alt2")
    names = {r["tableName"] for r in ddl.sql("SHOW TABLES").collect()}
    assert "alt2" in names and "alt" not in names


def test_views_and_cte(ddl, sf_dir):
    ddl.sql(
        f"CREATE OR REPLACE VIEW big_orders AS "
        f"SELECT * FROM parquet.`{sf_dir}/orders.parquet` WHERE o_totalprice > 100000"
    )
    n_view = ddl.sql("SELECT count(*) n FROM big_orders").collect()[0]["n"]
    n_cte = ddl.sql(
        f"WITH b AS (SELECT * FROM parquet.`{sf_dir}/orders.parquet` "
        f"WHERE o_totalprice > 100000) SELECT count(*) n FROM b"
    ).collect()[0]["n"]
    assert n_view == n_cte > 0
    ddl.sql("ALTER VIEW big_orders AS SELECT 1 AS one")
    assert ddl.sql("SELECT * FROM big_orders").collect()[0]["one"] == 1
    ddl.sql("DROP VIEW big_orders")


def test_truncate(ddl):
    ddl.sql("CREATE TABLE tr (x INT) USING parquet")
    ddl.sql("INSERT INTO tr VALUES (1), (2)")
    ddl.sql("TRUNCATE TABLE tr")
    assert ddl.sql("SELECT count(*) n FROM tr").collect()[0]["n"] == 0


def test_show_describe_explain_set_use(ddl):
    ddl.sql("CREATE TABLE IF NOT EXISTS meta_t (x INT) USING parquet")
    assert any(r["namespace"] == "mis_ddl" for r in ddl.sql("SHOW DATABASES").collect())
    desc = ddl.sql("DESCRIBE TABLE meta_t").collect()
    assert desc[0]["col_name"] == "x"
    desc_fmt = ddl.sql("DESCRIBE FORMATTED meta_t").collect()
    assert any("Provider" in str(r) or "Type" in str(r) for r in desc_fmt)
    fns = ddl.sql("SHOW FUNCTIONS LIKE 'concat*'").collect()
    assert fns
    explain = ddl.sql("EXPLAIN SELECT * FROM meta_t WHERE x > 1").collect()[0][0]
    assert "Scan" in explain or "FileScan" in explain
    ddl.sql("SET spark.sql.shuffle.partitions=7")
    assert ddl.conf.get("spark.sql.shuffle.partitions") == "7"
    ddl.sql("SET spark.sql.shuffle.partitions=8")


def test_analyze_compute_stats(ddl, sf_dir):
    ddl.sql(
        f"CREATE TABLE stat_t USING parquet AS "
        f"SELECT * FROM parquet.`{sf_dir}/region.parquet`"
    )
    # reference: COMPUTE STATS (fe/.../analysis/ComputeStatsStmt.java) →
    # ANALYZE TABLE; per-column NDV feeds the CBO like the reference's
    # column stats fed its join planner.
    ddl.sql("ANALYZE TABLE stat_t COMPUTE STATISTICS FOR ALL COLUMNS")
    detail = ddl.sql("DESCRIBE EXTENDED stat_t r_regionkey").collect()
    stats = {r["info_name"]: r["info_value"] for r in detail}
    assert stats.get("distinct_count") not in (None, "NULL")


def test_char_varchar_semantics(ddl):
    """CHAR(n) pads on read, VARCHAR(n) enforces length (SURVEY §1.3:
    reference types.h:54-55; Spark CharType/VarcharType)."""
    ddl.sql("CREATE TABLE cv (c CHAR(5), v VARCHAR(5)) USING parquet")
    ddl.sql("INSERT INTO cv VALUES ('ab', 'ab')")
    row = ddl.sql("SELECT c, v, length(c) lc, length(v) lv FROM cv").collect()[0]
    assert row["c"] == "ab   " and row["lc"] == 5  # CHAR pads to width
    assert row["v"] == "ab" and row["lv"] == 2     # VARCHAR stores as-is
    # equality ignores CHAR trailing pad (reference CHAR comparison rule)
    n = ddl.sql("SELECT count(*) n FROM cv WHERE c = 'ab'").collect()[0]["n"]
    assert n == 1
    # overlong VARCHAR insert is rejected (declared length enforced)
    import pytest as _pytest

    with _pytest.raises(Exception):
        ddl.sql("INSERT INTO cv VALUES ('x', 'toolongvalue')")
    ddl.sql("DROP TABLE cv")


def test_load_data_inpath(ddl, tmp_path):
    """LOAD DATA INPATH (fe/.../analysis/LoadDataStmt.java): plain append,
    OVERWRITE, and a static PARTITION target — re-expressed by the engine
    as read+insertInto (same observable table state as the reference's
    file move)."""
    from minimised_impala_spark.engine import Engine

    eng = Engine(ddl)
    src = str(tmp_path / "staged")
    ddl.range(3).selectExpr("CAST(id AS INT) k", "CAST(id AS STRING) v").write.parquet(src)

    ddl.sql("CREATE TABLE ld (k INT, v STRING) USING parquet")
    out = eng.sql(f"LOAD DATA INPATH '{src}' INTO TABLE ld").collect()
    assert "file(s) into ld" in out[0]["summary"]
    eng.sql(f"LOAD DATA INPATH '{src}' INTO TABLE ld")
    assert ddl.sql("SELECT count(*) n FROM ld").collect()[0]["n"] == 6
    eng.sql(f"LOAD DATA INPATH '{src}' OVERWRITE INTO TABLE ld")
    assert ddl.sql("SELECT count(*) n FROM ld").collect()[0]["n"] == 3

    # static-partition load: files carry only data columns
    ddl.sql(
        "CREATE TABLE ldp (k INT, v STRING) USING parquet PARTITIONED BY (dt STRING)"
    )
    eng.sql(f"LOAD DATA INPATH '{src}' INTO TABLE ldp PARTITION (dt='2024-01-01')")
    rows = ddl.sql("SELECT DISTINCT dt FROM ldp").collect()
    assert [r["dt"] for r in rows] == ["2024-01-01"]
    assert ddl.sql("SELECT count(*) n FROM ldp").collect()[0]["n"] == 3


def test_create_table_like_parquet_file(ddl, tmp_path):
    """CREATE TABLE LIKE PARQUET '<file>' — schema inference from the
    parquet footer (fe/.../analysis/CreateTableLikeFileStmt.java)."""
    from minimised_impala_spark.engine import Engine

    eng = Engine(ddl)
    src = str(tmp_path / "schema_src")
    ddl.sql(
        "SELECT CAST(1 AS INT) a, CAST('x' AS STRING) b, CAST(1.5 AS DOUBLE) c"
    ).write.parquet(src)
    eng.sql(f"CREATE TABLE clf LIKE PARQUET '{src}'")
    assert dict(ddl.table("clf").dtypes) == {"a": "int", "b": "string", "c": "double"}
    assert ddl.table("clf").count() == 0
    ddl.sql("INSERT INTO clf VALUES (1, 'y', 2.5)")
    assert ddl.table("clf").count() == 1


def test_load_data_overwrite_targets_only_named_partition(ddl, tmp_path):
    """OVERWRITE into a static partition replaces ONLY that partition
    (LoadDataStmt semantics) — other partitions survive."""
    from minimised_impala_spark.engine import Engine

    eng = Engine(ddl)
    src = str(tmp_path / "staged_p")
    ddl.range(2).selectExpr("CAST(id AS INT) k", "CAST(id AS STRING) v").write.parquet(src)
    ddl.sql(
        "CREATE TABLE ldp2 (k INT, v STRING) USING parquet PARTITIONED BY (dt STRING)"
    )
    eng.sql(f"LOAD DATA INPATH '{src}' INTO TABLE ldp2 PARTITION (dt='a')")
    eng.sql(f"LOAD DATA INPATH '{src}' INTO TABLE ldp2 PARTITION (dt='b')")
    eng.sql(f"LOAD DATA INPATH '{src}' OVERWRITE INTO TABLE ldp2 PARTITION (dt='b')")
    by_dt = {
        r["dt"]: r["n"]
        for r in ddl.sql("SELECT dt, count(*) n FROM ldp2 GROUP BY dt").collect()
    }
    assert by_dt == {"a": 2, "b": 2}  # 'a' untouched, 'b' replaced not doubled


def test_create_like_parquet_if_not_exists(ddl, tmp_path):
    from minimised_impala_spark.engine import Engine

    eng = Engine(ddl)
    src = str(tmp_path / "schema_src2")
    ddl.sql("SELECT 1 AS a").write.parquet(src)
    eng.sql(f"CREATE TABLE IF NOT EXISTS clf2 LIKE PARQUET '{src}'")
    # second run is a no-op, not an error
    out = eng.sql(f"CREATE TABLE IF NOT EXISTS clf2 LIKE PARQUET '{src}'").collect()
    assert "already exists" in out[0]["summary"]


def test_alter_table_partition_lifecycle(ddl, tmp_path):
    """ALTER TABLE ADD/DROP PARTITION and RECOVER PARTITIONS — the
    reference's AlterTableAddPartitionStmt / AlterTableDropPartitionStmt /
    AlterTableRecoverPartitionsStmt (fe/.../analysis/). RECOVER discovers
    partition dirs written directly to storage, the pattern for data
    landed by an external pipeline."""
    loc = tmp_path / "pt"
    ddl.sql(
        f"CREATE TABLE pt (k INT) USING parquet PARTITIONED BY (p STRING) "
        f"LOCATION '{loc}'"
    )
    ddl.sql("ALTER TABLE pt ADD PARTITION (p='a')")
    parts = {r[0] for r in ddl.sql("SHOW PARTITIONS pt").collect()}
    assert "p=a" in parts
    # a partition dir landed outside the catalog (external writer)
    ddl.sql("SELECT 7 AS k").write.mode("overwrite").parquet(str(loc / "p=ext"))
    ddl.sql("ALTER TABLE pt RECOVER PARTITIONS")
    parts = {r[0] for r in ddl.sql("SHOW PARTITIONS pt").collect()}
    assert "p=ext" in parts
    assert ddl.sql("SELECT k FROM pt WHERE p='ext'").collect()[0]["k"] == 7
    ddl.sql("ALTER TABLE pt DROP PARTITION (p='ext')")
    parts = {r[0] for r in ddl.sql("SHOW PARTITIONS pt").collect()}
    assert "p=ext" not in parts
    assert ddl.sql("SELECT count(*) n FROM pt").collect()[0]["n"] == 0
    ddl.sql("DROP TABLE pt")


def test_show_table_and_column_stats_and_files(spark, tmp_path):
    """Impala SHOW TABLE STATS / SHOW COLUMN STATS / SHOW FILES IN
    (fe/.../analysis/ShowStatsStmt.java, ShowFilesStmt.java): -1 before
    COMPUTE STATS, real numbers after, and a file listing of the table
    location."""
    import shutil

    from minimised_impala_spark.engine import Engine

    eng = Engine(spark)
    spark.sql("DROP TABLE IF EXISTS show_stats_t")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{warehouse.removeprefix('file:')}/show_stats_t", ignore_errors=True
    )
    spark.sql("CREATE TABLE show_stats_t (a INT, b STRING) USING PARQUET")
    spark.sql("INSERT INTO show_stats_t VALUES (1,'x'),(2,'y'),(2,NULL)")

    before = eng.sql("SHOW TABLE STATS show_stats_t").collect()[0]
    assert before["num_rows"] == -1  # reference shows -1 pre-stats

    eng.sql("COMPUTE STATS show_stats_t")
    spark.sql("ANALYZE TABLE show_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")

    after = eng.sql("SHOW TABLE STATS show_stats_t").collect()[0]
    assert after["num_rows"] == 3 and after["size_bytes"] > 0
    assert after["location"].endswith("show_stats_t")

    cols = {r["column"]: r for r in eng.sql("SHOW COLUMN STATS show_stats_t").collect()}
    assert cols["a"]["ndv"] == 2 and cols["a"]["num_nulls"] == 0
    assert cols["b"]["num_nulls"] == 1

    files = eng.sql("SHOW FILES IN show_stats_t").collect()
    assert files and all(r["path"].endswith(".parquet") for r in files)
    assert all(r["size_bytes"] > 0 for r in files)
    spark.sql("DROP TABLE show_stats_t")


def test_explain_levels(ddl):
    """EXPLAIN_LEVEL 0-3 (functional-query explain-level0..3.test): the
    session option changes the detail tier — standard outline at 0/1,
    per-node sections at 2, all plan phases at 3."""
    from minimised_impala_spark.engine import Engine

    eng = Engine(ddl)
    ddl.range(10).createOrReplaceTempView("explain_lvl_t")
    q = "SELECT count(*) AS n FROM explain_lvl_t WHERE id > 1"
    lvl1 = eng.explain(q)                       # default level 1
    assert "== Physical Plan ==" in lvl1
    assert "== Parsed Logical Plan ==" not in lvl1
    lvl2 = eng.explain(q, level=2)
    assert "(1) Scan" in lvl2 or "(1) " in lvl2  # formatted node sections
    lvl3 = eng.explain(q, level=3)
    assert "== Parsed Logical Plan ==" in lvl3 and "== Physical Plan ==" in lvl3
    # SET EXPLAIN_LEVEL drives the default
    ddl.sql("SET EXPLAIN_LEVEL=3")
    try:
        assert "== Parsed Logical Plan ==" in eng.explain(q)
    finally:
        ddl.conf.unset("EXPLAIN_LEVEL")


def test_partitioned_insert_slices(ddl, sf_dir):
    """tpcds-insert/partitioned-insert.test: INSERT OVERWRITE with a
    dynamic partition key, loaded slice by slice (day -> month range),
    with per-partition row accounting and partition-pruned re-reads.
    OVERWRITE replaces only the partitions the SELECT produces (dynamic
    partition overwrite), as the reference's per-partition results show."""
    from pyspark.sql import functions as F

    from minimised_impala_spark.tables import load_table

    ddl.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        orders = load_table(ddl, sf_dir, "orders")
        orders.createOrReplaceTempView("orders_src")
        ddl.sql(
            "CREATE TABLE orders_ins (o_orderkey BIGINT, o_totalprice DOUBLE, "
            "ord_month INT) USING parquet PARTITIONED BY (ord_month)"
        )
        # single-month slice (the reference's 'day' at fixture scale)
        ddl.sql(
            "INSERT OVERWRITE TABLE orders_ins PARTITION (ord_month) "
            "SELECT o_orderkey, o_totalprice, month(o_orderdate) AS ord_month "
            "FROM orders_src WHERE o_orderdate >= '1997-03-01' "
            "AND o_orderdate < '1997-04-01'"
        )
        day_n = ddl.table("orders_ins").count()
        assert day_n > 0
        # month range overwrite: month-3 partition REPLACED, others added
        ddl.sql(
            "INSERT OVERWRITE TABLE orders_ins PARTITION (ord_month) "
            "SELECT o_orderkey, o_totalprice, month(o_orderdate) AS ord_month "
            "FROM orders_src WHERE o_orderdate >= '1997-01-01' "
            "AND o_orderdate < '1997-04-01'"
        )
        per_part = {
            r["ord_month"]: r["n"]
            for r in ddl.sql(
                "SELECT ord_month, count(*) AS n FROM orders_ins GROUP BY ord_month"
            ).collect()
        }
        assert sorted(per_part) == [1, 2, 3]
        expect = {
            m: orders.filter(
                (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == m)
            ).count()
            for m in (1, 2, 3)
        }
        assert per_part == expect  # month 3 was REPLACED, not appended
        # partition-pruned single-slice read
        one = ddl.sql("SELECT count(*) AS n FROM orders_ins WHERE ord_month = 2")
        assert one.collect()[0]["n"] == expect[2]
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
    finally:
        ddl.sql("DROP TABLE IF EXISTS orders_ins")
        ddl.conf.unset("spark.sql.sources.partitionOverwriteMode")
