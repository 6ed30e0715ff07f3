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
