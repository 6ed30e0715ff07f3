"""Data-layout clustering (sources/formats.py optimize_layout): proves the
scan-pruning claim with real metrics — after range-clustering on the
filter key, the SAME pushed predicate reads a small fraction of the rows
the unclustered layout reads (parquet row-group min/max + file pruning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minimised_impala_spark.sources import formats
from minimised_impala_spark.tables import load_table


def _scan_rows(spark, path: str, pred: str) -> tuple[int, int]:
    """(rows read by the scan, rows returned) for a filtered read."""
    df = spark.read.parquet(path).filter(pred)
    out = df.count()
    # re-run and read the scan metric from the executed plan
    df2 = spark.read.parquet(path).filter(pred)
    df2.collect()
    node = df2._jdf.queryExecution().executedPlan()
    scanned = None

    def walk(n):
        nonlocal scanned
        cls = n.getClass().getSimpleName()
        if cls == "FileSourceScanExec":
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    scanned = kv._2().value()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(n.plan())
            return
        for i in range(n.children().size()):
            walk(n.children().apply(i))

    walk(node)
    assert scanned is not None, "no FileSourceScanExec found"
    return scanned, out


def test_clustered_layout_prunes_row_groups(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()

    # unclustered: key order scrambled (hash of orderkey), tiny row groups
    scrambled = li.orderBy(F.md5(F.col("l_orderkey").cast("string")))
    p_raw = str(tmp_path / "raw")
    scrambled.repartition(8).write.option("parquet.block.size", "65536").parquet(p_raw)

    # clustered on the filter key, same row-group size
    p_clu = str(tmp_path / "clustered")
    formats.optimize_layout(
        li, p_clu, ["l_orderkey"], n_files=8, parquet_block_bytes=65536
    )

    # selective enough that the clustered layout keeps ~1 of 8 range
    # slices; repartitionByRange samples boundaries, so the margin must
    # tolerate slice-edge wobble (a 100-200 band once landed at exactly
    # raw/4 rows and flapped)
    pred = "l_orderkey < 100"
    raw_scanned, raw_out = _scan_rows(spark, p_raw, pred)
    clu_scanned, clu_out = _scan_rows(spark, p_clu, pred)

    assert raw_out == clu_out  # same answer
    # clustered scan must read far fewer rows than the full table; the
    # scrambled layout has useless min/max stats and reads ~everything
    assert clu_scanned < raw_scanned / 3, (clu_scanned, raw_scanned)
    assert raw_scanned > n / 2  # sanity: scrambled layout really is unprunable


def test_optimize_layout_file_count_and_order(spark, sf_dir, tmp_path):
    import os

    orders = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "o")
    formats.optimize_layout(orders, p, ["o_custkey"], n_files=4)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4
    # each file owns a contiguous, non-overlapping o_custkey slice
    ranges = []
    for f in files:
        df = spark.read.parquet(os.path.join(p, f))
        r = df.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order vs single-key clustering under a 2-dim predicate: the
    single-key layout prunes only on `a` (each row group spans the full
    `b` range), the Morton layout confines row groups to (a, b)
    rectangles, so the same pushed filters scan strictly fewer rows."""
    # co-prime moduli: within any fixed a, b still sweeps its range
    # (b = (a + 3k) mod 997 across id = a + 1000k) — a same-modulus pick
    # like (id*7919) % 1000 collapses b to a function of a and the two
    # layouts become identical
    df = spark.range(200_000).select(
        (F.col("id") % 1000).cast("int").alias("a"),
        (F.col("id") % 997).cast("int").alias("b"),
        F.col("id").alias("payload"),
    )
    # box ~20% per dimension (4% of the plane): wide enough that the
    # a-only layout must scan the whole 20% a-slice while Morton row
    # groups stay confined to the box's neighborhood
    pred = "a BETWEEN 100 AND 300 AND b BETWEEN 100 AND 300"

    p_a = str(tmp_path / "cluster_a")
    formats.optimize_layout(df, p_a, ["a"], n_files=8, parquet_block_bytes=65536)
    p_z = str(tmp_path / "zorder")
    formats.zorder_layout(df, p_z, "a", "b", n_files=8, parquet_block_bytes=65536)

    a_scanned, a_out = _scan_rows(spark, p_a, pred)
    z_scanned, z_out = _scan_rows(spark, p_z, pred)
    assert a_out == z_out  # identical result set from both layouts
    assert z_scanned < a_scanned, (z_scanned, a_scanned)


def test_parquet_bloom_filter_prunes_absent_key(spark, tmp_path):
    """Parquet column bloom filters: for a high-cardinality key written in
    RANDOM order, every row group's min/max spans the whole key range, so
    only the bloom filter can prove a point-lookup key absent and skip
    the group. The bloomed layout must scan strictly fewer rows for an
    absent-key equality probe; at 100 TB this is the needle-in-haystack
    path (id lookups on unsorted fact tables)."""
    df = spark.range(200_000).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.col("id").alias("v")
    )
    # dictionary encoding off for BOTH layouts: parquet dictionary pages
    # can also prove equality keys absent, which would mask the bloom
    # filter's contribution; the probe is an in-range hex string so
    # min/max stats cannot prune either
    p_plain = str(tmp_path / "plain")
    (
        df.repartition(4)
        .write.option("parquet.block.size", "65536")
        .option("parquet.enable.dictionary", "false")
        .parquet(p_plain)
    )
    p_bloom = str(tmp_path / "bloom")
    (
        df.repartition(4)
        .write.option("parquet.block.size", "65536")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "200000")
        .parquet(p_bloom)
    )
    import hashlib

    absent = hashlib.md5(b"key-not-in-the-range").hexdigest()
    probe = f"k = '{absent}'"
    plain_scanned, plain_out = _scan_rows(spark, p_plain, probe)
    bloom_scanned, bloom_out = _scan_rows(spark, p_bloom, probe)
    assert plain_out == 0 and bloom_out == 0
    assert bloom_scanned < plain_scanned, (bloom_scanned, plain_scanned)
