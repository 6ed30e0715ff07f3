"""Independent property checks added in round 8.

The headline one pins the triangle-count orientation fix: the old
packed key ``d * 1000 + node`` silently merged two nodes whenever
``n2 - n1 == 1000 * (d1 - d2)`` (first reachable once ids pass 1000 —
sf0.1 already has max id 1013).  The fixture below constructs exactly
that collision (node 400 at degree 3 vs node 1400 at degree 2) and
asserts the engine's count against a driver-side brute force, plus
full id-translation invariance, which any packed-key scheme breaks at
some id range by pigeonhole while the (degree, node) tuple orientation
cannot."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import QUERIES

load_all()

# Edges of the wanted co-occurrence graph: one triangle (2, 400, 1400)
# plus a pendant (400, 2500).  Degrees: 2→2, 400→3, 1400→2, 2500→1, so
# the OLD keys for 400 and 1400 were both 3400 — the collision.
_EDGES = [(2, 400), (2, 1400), (400, 1400), (400, 2500)]


def _events_fixture(tmp_path, offset: int) -> str:
    rows = []
    eid = 0
    for (u, v), h in itertools.product(_EDGES, range(4)):
        # four shared (event_type, hour) cells per pair → passes the
        # weight >= 4 edge threshold; 2-user cells never hit the 16-cap
        for uid in (u, v):
            rows.append(
                (
                    eid,
                    pd.Timestamp(f"2024-01-01 {h:02d}:15:00"),
                    uid + offset,
                    f"pair_{u}_{v}",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = tmp_path / f"off{offset}"
    out.mkdir()
    df.to_parquet(out / "events.parquet", index=False)
    return str(out)


def _brute_triangles(edges: list[tuple[int, int]]) -> tuple[int, int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    tris = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    return len(adj), wedges, tris


def test_triangle_count_survives_old_key_collision(spark, tmp_path):
    base = _events_fixture(tmp_path, 0)
    row = QUERIES["events_triangle_count"](spark, base).collect()[0]
    n_nodes, n_wedges, n_tri = _brute_triangles(_EDGES)
    assert row["n_nodes"] == n_nodes == 4
    assert row["n_edges"] == len(_EDGES) == 4
    assert row["n_wedges"] == n_wedges == 5
    assert row["n_triangles"] == n_tri == 1


@pytest.mark.parametrize("offset", [7000, 1_000_000_000_000])
def test_triangle_count_id_translation_invariant(spark, tmp_path, offset):
    # Shifting every user id by a constant relabels the graph without
    # changing its shape; all five outputs must be bit-identical.  The
    # 1e12 offset additionally proves no packed-key arithmetic can
    # overflow with realistic 64-bit ids.
    base = QUERIES["events_triangle_count"](
        spark, _events_fixture(tmp_path, 0)
    ).collect()
    shifted = QUERIES["events_triangle_count"](
        spark, _events_fixture(tmp_path, offset)
    ).collect()
    assert base == shifted


def _round_half_away(v: float) -> int:
    # Spark/DuckDB round() is half-away-from-zero; Python's is banker's
    return int(np.floor(v + 0.5)) if v >= 0 else -int(np.floor(-v + 0.5))


def test_rolling_active_matches_bruteforce(spark, sf_dir):
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"], r["stickiness_permille"])
        for r in QUERIES["events_rolling_active"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "ts"]]
    ud = ev.assign(day=ev["ts"].dt.normalize().dt.date).drop_duplicates(
        ["user_id", "day"]
    )[["user_id", "day"]]
    days = sorted(ud["day"].unique())
    assert set(got) == set(days)
    import datetime as _dt

    for d in days:
        lo7 = d - _dt.timedelta(days=6)
        lo28 = d - _dt.timedelta(days=27)
        dau = ud[ud["day"] == d]["user_id"].nunique()
        wau = ud[(ud["day"] >= lo7) & (ud["day"] <= d)]["user_id"].nunique()
        mau = ud[(ud["day"] >= lo28) & (ud["day"] <= d)]["user_id"].nunique()
        stick = _round_half_away(1000.0 * dau / mau)
        assert got[d] == (dau, wau, mau, stick), d


def test_readability_bands_match_bruteforce(spark, sf_dir):
    import re as _re

    got = {
        (r["lang"], r["band"]): (r["n_docs"], r["avg_words"], r["avg_flesch_e2"])
        for r in QUERIES["text_readability_scores"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "text"]]
    rows = []
    for lang, text in docs.itertuples(index=False):
        words = len(_re.findall(r"\S+", text))
        sents = max(len(_re.findall(r"[.!?]+", text)), 1)
        sylls = max(len(_re.findall(r"[aeiouy]+", text.lower())), 1)
        flesch = 206.835 - 1.015 * (words / sents) - 84.6 * (sylls / max(words, 1))
        fe2 = int(np.floor(flesch * 100))
        band = (
            "very_easy" if fe2 >= 9000 else
            "easy" if fe2 >= 7000 else
            "standard" if fe2 >= 5000 else
            "difficult" if fe2 >= 3000 else "very_difficult"
        )
        rows.append((lang, band, words, fe2))
    bf = pd.DataFrame(rows, columns=["lang", "band", "words", "fe2"])
    agg = bf.groupby(["lang", "band"]).agg(
        n_docs=("words", "size"), avg_words=("words", "mean"),
        avg_fe2=("fe2", "mean"),
    )
    assert set(got) == set(agg.index)
    for (lang, band), r in agg.iterrows():
        assert got[(lang, band)] == (
            int(r["n_docs"]),
            _round_half_away(r["avg_words"]),
            _round_half_away(r["avg_fe2"]),
        ), (lang, band)


def test_partition_skew_report_internal_consistency(spark, sf_dir):
    rows = QUERIES["pipeline_partition_skew_report"](spark, sf_dir).collect()
    assert {r["part_key"] for r in rows} == {
        "events.event_type", "events.day", "lineitem.shipmonth",
        "orders.ordermonth",
    }
    for r in rows:
        # structural invariants any valid skew report satisfies
        assert r["max_rows"] * r["n_partitions"] >= r["total_rows"]
        assert r["max_over_avg_permille"] >= 1000
        assert 0 < r["top1_share_permille"] <= 1000
        assert r["max_over_avg_permille"] == _round_half_away(
            1000.0 * r["max_rows"] * r["n_partitions"] / r["total_rows"]
        )


def test_quality_scorecard_reflects_components(spark, sf_dir):
    rows = {
        r["component"]: r
        for r in QUERIES["pipeline_quality_scorecard"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        "ann_ivf_recall", "cm_heavy_hitters", "hll_union", "kll_quantiles",
        "kmv_distinct", "minhash_jaccard",
    }
    for r in rows.values():
        assert r["within_budget"] == (r["err_permille"] <= r["budget_permille"])
        assert r["n_units"] > 0
    # cross-check one component against its source report directly
    kmv = QUERIES["agg_kmv_distinct_report"](spark, sf_dir).collect()
    assert rows["kmv_distinct"]["n_units"] == len(kmv)
    assert rows["kmv_distinct"]["err_permille"] == max(
        abs(r["rel_err_permille"]) for r in kmv
    )
