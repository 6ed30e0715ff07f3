"""Hypothesis property tests for the dialect parity layer — arbitrary
inputs against driver-side Python models (the reference's expr-test.cc
covers fixed goldens; these cover the input space between them).

Each hypothesis example is a BATCH evaluated in one Spark job
(per-example jobs would take minutes); derandomize keeps CI stable."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from minimised_impala_spark.functions import parity as P
from tests.test_parity_functions import fnv1a64, rot64

_BATCH = dict(min_size=30, max_size=120)


@settings(max_examples=4, deadline=None, derandomize=True)
@given(st.lists(st.text(max_size=60), **_BATCH))
def test_fnv_hash_property(spark, samples):
    samples = list(dict.fromkeys(samples))
    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", P.fnv_hash(F.col("s")).alias("h")).collect()
    }
    for s in samples:
        assert got[s] == fnv1a64(s.encode("utf-8")), repr(s)


@settings(max_examples=4, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.text(max_size=40), st.integers(-5, 100)), **_BATCH))
def test_strright_matches_python_model(spark, cases):
    df = spark.createDataFrame(cases, "s STRING, n INT")
    got = df.select("s", "n", P.strright(F.col("s"), F.col("n")).alias("r")).collect()
    for r in got:
        expect = "" if r["n"] <= 0 else r["s"][-r["n"]:]
        assert r["r"] == expect, (r["s"], r["n"])


@settings(max_examples=4, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(-(1 << 63), (1 << 63) - 1), st.integers(0, 300)
        ),
        **_BATCH,
    )
)
def test_rotate_inverse_property(spark, cases):
    """rotateright(rotateleft(x, n), n) == x, and rotateleft matches the
    Python model, for arbitrary 64-bit x and shift counts."""
    df = spark.createDataFrame(cases, "x LONG, n INT")
    got = df.select(
        "x", "n",
        P.rotateright(P.rotateleft(F.col("x"), F.col("n")), F.col("n")).alias("rt"),
        P.rotateleft(F.col("x"), F.col("n")).alias("rl"),
    ).collect()
    for r in got:
        assert r["rt"] == r["x"], (r["x"], r["n"])
        assert r["rl"] == rot64(r["x"] % (1 << 64), r["n"] % 64, True), (r["x"], r["n"])


@settings(max_examples=20, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=300),
)
def test_chunk_overlap_invariants(spark, n_tokens):
    """text_chunk_overlap coverage invariants against a Python model:
    every token position is covered by >= 1 chunk; chunks advance by the
    stride; only the final chunk may be short; consecutive chunks overlap
    by exactly W-S when full."""
    W, S = 64, 48
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    df.createOrReplaceTempView("prop_chunk_doc")
    from pyspark.sql import functions as FF

    toks = FF.split("text", " ")
    n = FF.size(toks)
    last_chunk = FF.when(n <= W, FF.lit(0)).otherwise(
        FF.ceil((n - W) / FF.lit(float(S))).cast("int")
    )
    chunk = FF.slice(FF.col("toks"), FF.col("chunk_id") * S + 1, FF.lit(W))
    rows = (
        df.select("doc_id", toks.alias("toks"),
                  FF.explode(FF.sequence(FF.lit(0), last_chunk)).alias("chunk_id"))
        .select("chunk_id", FF.size(chunk).alias("ln"))
        .orderBy("chunk_id")
        .collect()
    )
    # python model
    if n_tokens <= W:
        exp_chunks = 1
    else:
        exp_chunks = 1 + -(-(n_tokens - W) // S)
    assert len(rows) == exp_chunks
    covered = set()
    for r in rows:
        start = r["chunk_id"] * S
        assert r["ln"] == min(W, n_tokens - start)
        covered.update(range(start, start + r["ln"]))
    assert covered == set(range(n_tokens))
