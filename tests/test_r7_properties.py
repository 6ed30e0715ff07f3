"""Independent property checks for the round-7 operators whose oracle
compare is necessary but not sufficient: each test re-derives the
answer a THIRD way (NumPy/pandas brute force or a mathematical
invariant of the estimator), so a bug that slipped into both SQL
dialects identically would still be caught."""

from __future__ import annotations

import numpy as np
import pandas as pd

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import QUERIES

load_all()


def test_weighted_percentile_matches_bruteforce(spark, sf_dir):
    got = {
        (r["l_returnflag"], r["plabel"]): (r["total_w"], r["wpct_e2"])
        for r in QUERIES["agg_weighted_percentile"](spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_returnflag", "l_extendedprice", "l_quantity"]
    ]
    for g, grp in li.groupby("l_returnflag"):
        s = grp.sort_values(["l_extendedprice", "l_quantity"])
        w = s["l_quantity"].astype("int64").to_numpy()
        x = s["l_extendedprice"].to_numpy()
        cum = np.cumsum(w)
        total = int(cum[-1])
        for plabel, frac in (("p25", 0.25), ("p50", 0.50), ("p75", 0.75)):
            idx = int(np.searchsorted(cum, frac * total))
            assert got[(g, plabel)] == (total, round(x[idx] * 100)), (g, plabel)


def test_survival_km_invariants(spark, sf_dir):
    rows = QUERIES["events_survival_km"](spark, sf_dir).collect()
    assert rows
    prev_s, prev_risk = 1_000_000 + 1, None
    for r in rows:
        # S is non-increasing and within (0, 1]
        assert 0 < r["survival_e6"] <= 1_000_000
        assert r["survival_e6"] <= prev_s
        prev_s = r["survival_e6"]
        # the risk set only shrinks
        if prev_risk is not None:
            assert r["n_at_risk"] < prev_risk
        prev_risk = r["n_at_risk"]
        assert r["n_deaths"] + r["n_censored"] <= r["n_at_risk"]


def test_theta_sketch_exact_when_unsaturated(spark, sf_dir):
    """At sf0.001 every event type has < k distinct users, so θ = 2^52
    for every sketch and the estimator must be EXACT on every pair —
    the unsaturated-regime contract of the Theta sketch."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    if ev.groupby("event_type")["user_id"].nunique().max() >= 64:
        import pytest

        pytest.skip("fixture saturates the sketch; exactness only below k")
    for r in QUERIES["agg_theta_sketch_ops"](spark, sf_dir).collect():
        assert r["est_inter"] == r["exact_inter"], r
        assert r["est_union"] == r["exact_union"], r
        assert r["union_err_permille"] == 0, r


def test_cm_sketch_never_underestimates(spark, sf_dir):
    for r in QUERIES["streaming_cm_error_report"](spark, sf_dir).collect():
        assert r["est_n"] >= r["exact_n"], r
        assert r["overshoot"] >= 0, r


def test_interval_coverage_matches_bruteforce(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_islands"], r["covered_s"])
        for r in QUERIES["events_interval_coverage"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["user_id"] < 200]
    for uid, grp in ev.groupby("user_id"):
        # datetime64 unit varies with pandas/parquet (ns vs us) — go
        # through datetime64[s] explicitly; round half-up like F.round
        s = grp["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        e = s + np.maximum(
            np.floor(grp["value"].to_numpy() + 0.5), 0
        ).astype("int64")
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        islands, cov, cur_s, cur_e = 0, 0, None, None
        for a, b in zip(s, e):
            if cur_e is None or a > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                islands, cur_s, cur_e = islands + 1, a, b
            else:
                cur_e = max(cur_e, b)
        cov += cur_e - cur_s
        assert got[int(uid)] == (islands, cov), uid
