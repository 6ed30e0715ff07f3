"""Unit tests for operators/graph.py connected components (min-label
propagation + pointer jumping), verified against a driver-side union-find
on seeded random graphs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from minimised_impala_spark.operators.graph import connected_components


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonicalize to min node id per component
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for r, ns in comp.items() for n in ns}


def _cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = connected_components(df).collect()
    return {r["id"]: r["comp"] for r in got}


def test_long_chain_converges(spark):
    # path 0-1-2-...-15: diameter 15 forces multiple pointer-jump rounds
    edges = [(i, i + 1) for i in range(15)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(16)}


def test_disjoint_components_and_self_loops(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20), (30, 31), (31, 30)]
    got = _cc(spark, edges)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[30] == got[31] == 30
    # pure self-loop node is dropped by the a != b filter (isolated)
    assert 20 not in got


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 200
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(50, 150))
        ]
        edges = [(u, v) for u, v in edges if u != v]
        expect = _union_find_components(edges)
        got = _cc(spark, edges)
        assert got == expect, f"trial {trial}"


# ---------------------------------------------------------------- pagerank


def _pagerank_numpy(
    edges: list[tuple[int, int, float]],
    nodes: list[int],
    d: float = 0.85,
    k: int = 5,
) -> dict[int, float]:
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0.0] * n
    for s, _t, w in edges:
        out[idx[s]] += w
    r = [1.0 / n] * n
    for _ in range(k):
        contrib = [0.0] * n
        for s, t, w in edges:
            contrib[idx[t]] += r[idx[s]] * (w / out[idx[s]])
        dangle = sum(r[i] for i in range(n) if out[i] == 0.0)
        r = [(1 - d) / n + d * (contrib[i] + dangle / n) for i in range(n)]
    return {nd: r[idx[nd]] for nd in nodes}


def test_pagerank_matches_reference(spark):
    from minimised_impala_spark.operators.graph import pagerank

    rng = random.Random(42)
    nodes = list(range(12))
    edges = []
    seen = set()
    for _ in range(40):
        s, t = rng.randrange(12), rng.randrange(12)
        if s != t and (s, t) not in seen:
            seen.add((s, t))
            edges.append((s, t, float(rng.randint(1, 9))))
    # node 11 dangling: strip its out-edges to exercise the dangling term
    edges = [e for e in edges if e[0] != 11]
    edf = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    ndf = spark.createDataFrame([(n,) for n in nodes], "node LONG")
    got = {r["node"]: r["rank"] for r in pagerank(edf, ndf).collect()}
    want = _pagerank_numpy(edges, nodes)
    assert set(got) == set(want)
    for n in nodes:
        assert abs(got[n] - want[n]) < 1e-12, (n, got[n], want[n])
    # rank mass is conserved (sums to 1 up to float error)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    from minimised_impala_spark.operators.graph import pagerank

    edges = [(i, (i + 1) % 5, 1.0) for i in range(5)]
    edf = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    ndf = spark.createDataFrame([(i,) for i in range(5)], "node LONG")
    got = {r["node"]: r["rank"] for r in pagerank(edf, ndf).collect()}
    for v in got.values():
        assert abs(v - 0.2) < 1e-12
