"""Robustness pins mirroring the reference's functional-query edge files.

The reference's functional-query workload carries dedicated edge-case
files beyond operator semantics; these tests pin the same behaviors on
this engine:

- overflow.test: a table holding every numeric type's extremes
  (TINYINT..BIGINT min/max, float/double ±Infinity) must round-trip
  EXACTLY through both the parquet path and the delimited-text scanner.
- max-nesting-depth.test: deeply nested struct/array values survive a
  parquet round trip and unnest back to the original leaves.
- wide-row.test: a very wide row (1000 columns) scans, projects and
  filters; column pruning keeps the projected scan narrow.
- large_strings.test: multi-megabyte strings flow through length/concat/
  substring/hash without truncation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_numeric_extremes_roundtrip_parquet_and_text(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("t", T.ByteType()),
            T.StructField("s", T.ShortType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("b", T.LongType()),
            T.StructField("f", T.FloatType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    rows = [
        (-128, -32768, -2147483648, -9223372036854775808,
         float("-inf"), float("-inf")),
        (1, 2, 3, 4, 5.5, 6.6),
        (127, 32767, 2147483647, 9223372036854775807,
         float("inf"), float("inf")),
    ]
    df = spark.createDataFrame(rows, schema)

    pq = str(tmp_path / "overflow_pq")
    df.write.parquet(pq)
    got = sorted(map(tuple, spark.read.parquet(pq).collect()))
    assert got == sorted(rows)

    # Delimited-text path: CSV with an explicit schema (the reference's
    # text scanner resolves types from the table schema, not inference).
    txt = str(tmp_path / "overflow_txt")
    df.write.option("header", "false").csv(txt)
    back = spark.read.schema(schema).csv(txt)
    got_txt = sorted(map(tuple, back.collect()))
    assert got_txt == sorted(rows)


def test_max_nesting_depth_roundtrip(spark, tmp_path):
    depth = 16
    # value nested depth-16: struct(v, child: struct(v, child: ...))
    leaf = F.struct(F.lit(depth).alias("v"))
    node = leaf
    for lvl in range(depth - 1, 0, -1):
        node = F.struct(F.lit(lvl).alias("v"), node.alias("child"))
    df = spark.range(3).select(F.col("id"), node.alias("n"))

    path = str(tmp_path / "deep")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    # walk back down and check every level's leaf value
    col = F.col("n")
    sels = []
    for lvl in range(1, depth + 1):
        sels.append(col.getField("v").alias(f"v{lvl}"))
        if lvl < depth:
            col = col.getField("child")
    out = back.select(*sels).distinct().collect()
    assert len(out) == 1
    assert tuple(out[0]) == tuple(range(1, depth + 1))

    # arrays-of-arrays: depth-8 array nesting survives explode chains
    arr = F.array(F.lit(7))
    for _ in range(7):
        arr = F.array(arr)
    df2 = spark.range(1).select(arr.alias("a"))
    c = F.col("a")
    for _ in range(8):
        c = c.getItem(0)
    assert df2.select(c.alias("leaf")).collect()[0]["leaf"] == 7


def test_wide_row_scan_and_prune(spark, tmp_path):
    ncols = 1000
    df = spark.range(50).select(
        F.col("id"), *[(F.col("id") * k).alias(f"c{k}") for k in range(1, ncols)]
    )
    path = str(tmp_path / "wide")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert len(back.columns) == ncols

    narrow = back.select("id", "c500").filter(F.col("id") == 7)
    row = narrow.collect()[0]
    assert (row["id"], row["c500"]) == (7, 3500)
    # column pruning must reach the scan: ReadSchema carries only the
    # projected columns, not all 1000
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    rs = plan[plan.index("ReadSchema"):][:200] if "ReadSchema" in plan else ""
    assert "c500" in rs and "c499" not in rs, rs


def test_large_strings_flow(spark):
    # 4 MiB string through concat/length/substr/hash — no truncation
    mb = 4
    df = spark.range(2).select(
        F.col("id"),
        F.repeat(F.lit("x"), mb * 1024 * 1024).alias("big"),
    )
    out = df.select(
        "id",
        F.length("big").alias("len"),
        F.substring("big", mb * 1024 * 1024 - 2, 3).alias("tail3"),
        F.md5(F.concat("big", F.col("id").cast("string"))).alias("h"),
    ).collect()
    assert all(r["len"] == mb * 1024 * 1024 for r in out)
    assert all(r["tail3"] == "xxx" for r in out)
    assert out[0]["h"] != out[1]["h"]  # id suffix differentiates hashes


def test_latin1_delimited_text(spark, tmp_path):
    """delimited-latin-text.test: the text scanner reads non-UTF8
    (ISO-8859-1) delimited files via the encoding option."""
    from minimised_impala_spark.sources.formats import read_text

    path = tmp_path / "latin1"
    path.mkdir()
    rows = [(1, "café"), (2, "naïve"), (3, "über")]
    with open(path / "part-0.csv", "wb") as f:
        for k, s in rows:
            f.write(f"{k},{s}\n".encode("iso-8859-1"))
    df = read_text(
        spark, str(path), schema="k INT, s STRING", encoding="ISO-8859-1"
    )
    assert sorted(map(tuple, df.collect())) == rows


def test_hidden_files_skipped(spark, tmp_path):
    """hidden-files.test: files starting with '_' or '.' in a table
    directory are metadata, not data — the scan must skip them."""
    path = tmp_path / "hidden"
    path.mkdir()
    (path / "data.csv").write_text("1\n2\n")
    (path / "_metadata.csv").write_text("98\n")
    (path / ".hidden.csv").write_text("99\n")
    df = spark.read.schema("v INT").csv(str(path))
    assert sorted(r["v"] for r in df.collect()) == [1, 2]


def test_mixed_format_partitions(spark, tmp_path):
    """mixed-format.test: one logical table whose partitions live in
    different file formats reads transparently (per-partition scanner
    dispatch, HdfsScanNode); aggregates force full deserialization."""
    from minimised_impala_spark.sources.formats import read_mixed_partitions

    base = tmp_path / "mixed"
    schema = "id INT, int_col INT"
    rows = {1: [(1, 10), (2, 20)], 2: [(3, 30)], 3: [(4, 40), (5, 50), (6, 60)]}
    df1 = spark.createDataFrame(rows[1], schema)
    df1.write.parquet(str(base / "m1"))
    (base / "m2").mkdir(parents=True)
    with open(base / "m2" / "part.csv", "w") as f:
        for r in rows[2]:
            f.write(f"{r[0]},{r[1]}\n")
    spark.createDataFrame(rows[3], schema).write.json(str(base / "m3"))

    parts = [
        (str(base / "m1"), "parquet", {"month": 1}),
        (str(base / "m2"), "text", {"month": 2}),
        (str(base / "m3"), "json", {"month": 3}),
    ]
    tbl = read_mixed_partitions(spark, parts, schema)

    full = tbl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("int_col").alias("s")
    ).collect()[0]
    assert (full["n"], full["s"]) == (6, 210)

    # restrict to a multi-format subset of partitions
    sub = (
        tbl.filter((F.col("month") == 1) | (F.col("month") == 3))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("int_col").alias("s"))
        .collect()[0]
    )
    assert (sub["n"], sub["s"]) == (5, 180)

    # single partition alone
    one = tbl.filter(F.col("month") == 2).collect()
    assert [(r["id"], r["int_col"], r["month"]) for r in one] == [(3, 30, 2)]


def test_inline_view_limit(spark, sf_dir):
    """inline-view-limit.test: a LIMIT inside an inline view applies
    BEFORE outer predicates and joins — the outer filter must not push
    through the limit boundary."""
    from minimised_impala_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    inner = orders.orderBy("o_orderkey").limit(100)
    out = inner.filter(F.col("o_orderkey") > 50)
    got = [r["o_orderkey"] for r in out.orderBy("o_orderkey").collect()]
    # ground truth: first-100 orderkeys, then filter
    first100 = [
        r["o_orderkey"]
        for r in orders.orderBy("o_orderkey").limit(100).collect()
    ]
    assert got == sorted(k for k in first100 if k > 50)
    # and joining above the limit keeps the 100-row boundary
    joined = inner.join(
        load_table(spark, sf_dir, "customer"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    assert joined.count() <= 100


def test_null_dynamic_partition_key(spark, tmp_path):
    """insert_null.test / null_data.test: writing a NULL dynamic
    partition value lands in the default partition and reads back NULL."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id INT, pk STRING"
    )
    path = str(tmp_path / "nullpart")
    df.write.partitionBy("pk").parquet(path)
    back = spark.read.parquet(path)
    got = sorted(
        ((r["id"], r["pk"]) for r in back.collect()),
        key=lambda t: t[0],
    )
    assert got == [(1, "a"), (2, None), (3, "b")]
    # the default-partition directory exists on disk (Hive convention)
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("pk=")}
    assert "pk=__HIVE_DEFAULT_PARTITION__" in dirs, dirs


def test_partition_col_types_roundtrip(spark, tmp_path):
    """partition-col-types.test: partition keys of int/bigint/string/
    date types round-trip through the partitioned write path with
    partition pruning intact."""
    import datetime

    df = spark.createDataFrame(
        [
            (1, 10, 1000000000000, "x", datetime.date(1997, 1, 1)),
            (2, 20, 2000000000000, "y", datetime.date(1998, 6, 15)),
        ],
        "id INT, pi INT, pb BIGINT, ps STRING, pd DATE",
    )
    path = str(tmp_path / "ptypes")
    df.write.partitionBy("pi", "pb", "ps", "pd").parquet(path)
    back = spark.read.parquet(path)
    one = back.filter(
        (F.col("pi") == 20)
        & (F.col("pb") == 2000000000000)
        & (F.col("ps") == "y")
        & (F.col("pd") == F.lit("1998-06-15").cast("date"))
    ).collect()
    assert [(r["id"]) for r in one] == [2]
    # pruning reaches the scan: only one partition dir is read
    plan = (
        back.filter(F.col("pi") == 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "pi" in plan


def test_hive_null_sentinel_text(spark, tmp_path):
    r"""null_data.test: the reference's text tables encode NULL as '\N'
    (Hive convention); read_text(null_value=r'\N') honors it for every
    column type while plain '\N'-free values parse normally."""
    from minimised_impala_spark.sources.formats import read_text

    path = tmp_path / "nulls"
    path.mkdir()
    (path / "d.csv").write_text("1,a,2.5\n\\N,\\N,\\N\n3,\\N,4.5\n")
    df = read_text(
        spark, str(path), schema="i INT, s STRING, d DOUBLE", null_value=r"\N"
    )
    rows = sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert rows == [(1, "a", 2.5), (3, None, 4.5), (None, None, None)]


def test_insert_column_permutation(spark, tmp_path):
    """insert_permutation.test: INSERT INTO t (cols...) in permuted order
    maps values by NAME; unmentioned columns fill NULL."""
    spark.sql("DROP TABLE IF EXISTS perm_nopart")
    spark.sql(
        "CREATE TABLE perm_nopart (int_col1 INT, string_col STRING, "
        f"int_col2 INT) USING parquet LOCATION '{tmp_path}/perm'"
    )
    try:
        spark.sql(
            "INSERT INTO perm_nopart (int_col2, int_col1, string_col) "
            "VALUES (2, 1, 'str')"
        )
        spark.sql("INSERT INTO perm_nopart (int_col1) VALUES (9)")
        got = sorted(
            (tuple(r) for r in spark.table("perm_nopart").collect()),
            key=lambda t: t[0],
        )
        assert got == [(1, "str", 2), (9, None, None)]
    finally:
        spark.sql("DROP TABLE IF EXISTS perm_nopart")
