"""Independent property checks for the late-round-8 operators
(text_padding_efficiency, text_quality_calibration, text_kneser_ney_lm).

Each check recomputes the operator's answer from raw parquet with
pandas/numpy — no Spark, no DuckDB — so a shared misconception between
engine and oracle cannot hide."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import QUERIES

load_all()

SF_DIR = os.environ.get("MIS_TEST_SF_DIR", "/root/testdata/sf0.001")


def _round_half_away(v: float) -> int:
    # Spark/DuckDB round() is half-away-from-zero; Python's is banker's
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _docs() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


# ------------------------------------------------------------------ pad --
def test_padding_efficiency_brute_force(spark):
    out = {
        (r["strategy"], r["bucket_cap"]): r.asDict()
        for r in QUERIES["text_padding_efficiency"](spark, SF_DIR).collect()
    }
    docs = _docs()
    n = docs["text"].str.split(" ").str.len().clip(upper=128)
    caps = np.select([n <= 16, n <= 32, n <= 64], [16, 32, 64], default=128)
    expected_rows = 0
    for cap in sorted(set(caps)):
        sel = n[caps == cap]
        padded = len(sel) * cap
        row = out[("bucketed", cap)]
        assert row["n_docs"] == len(sel)
        assert row["sum_tokens"] == int(sel.sum())
        assert row["padded_tokens"] == padded
        assert row["waste_permille"] == _round_half_away(
            1000.0 * (padded - sel.sum()) / padded
        )
        expected_rows += 1
    naive = out[("single_max", 128)]
    assert naive["n_docs"] == len(n)
    assert naive["padded_tokens"] == len(n) * 128
    assert naive["waste_permille"] == _round_half_away(
        1000.0 * (len(n) * 128 - n.sum()) / (len(n) * 128)
    )
    assert len(out) == expected_rows + 1
    # bucketed batching must never waste MORE than single-max overall
    bucketed_pad = sum(
        r["padded_tokens"] for (s, _), r in out.items() if s == "bucketed"
    )
    assert bucketed_pad <= naive["padded_tokens"]


# ---------------------------------------------------------------- calib --
def test_quality_calibration_invariants(spark):
    rows = QUERIES["text_quality_calibration"](spark, SF_DIR).collect()
    docs = _docs()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # floor((rank-1)*10/n) buckets differ in size by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # deciles partition the corpus by ascending score, so the per-decile
    # mean score must be non-decreasing
    avgs = [r["avg_score_e6"] for r in rows]
    assert avgs == sorted(avgs)
    for r in rows:
        assert 0 <= r["n_gold"] <= r["n_docs"]
        assert r["gold_permille"] == _round_half_away(
            1000.0 * r["n_gold"] / r["n_docs"]
        )


# ------------------------------------------------------------------- kn --
def _kn_model(docs: pd.DataFrame):
    toks = docs["text"].str.split(" ")
    bigrams: list[tuple[int, str, str]] = []
    for doc_id, ts in zip(docs["doc_id"], toks):
        bigrams.extend((doc_id, a, b) for a, b in zip(ts, ts[1:]))
    bg = pd.DataFrame(bigrams, columns=["doc_id", "w1", "w2"])
    c12 = bg.groupby(["w1", "w2"]).size()
    c1 = bg.groupby("w1").size()
    n1h = c12.groupby("w1").size()
    n1t = c12.groupby("w2").size()
    b = len(c12)
    return bg, c12, c1, n1h, n1t, b


def _kn_prob(w1, w2, c12, c1, n1h, n1t, b, d=0.75) -> float:
    seen = c12.get((w1, w2), 0)
    cont = n1t.get(w2, 0) * 1.0 / b
    disc = (seen - d) / c1[w1] if seen else 0.0
    return disc + ((d * n1h[w1]) / c1[w1]) * cont


def test_kneser_ney_distribution_sums_to_one():
    """For every context w1, Σ_{w2 ∈ vocab} P(w2|w1) == 1 exactly —
    the defining property of a proper smoothed conditional (Laplace has
    it trivially; KN only if discount mass == continuation mass)."""
    docs = _docs()
    bg, c12, c1, n1h, n1t, b = _kn_model(docs)
    vocab = sorted(set(bg["w1"]) | set(bg["w2"]))
    # every context whose row in the model we can afford to sum fully
    contexts = c1.sort_values(ascending=False).index[:20]
    for w1 in contexts:
        total = sum(_kn_prob(w1, w2, c12, c1, n1h, n1t, b) for w2 in vocab)
        # Pcont sums to 1 over the vocab only for words seen as a
        # continuation; unseen-as-w2 words contribute 0 — which is
        # exactly the engine's closed world, so the sum is 1
        assert total == pytest.approx(1.0, abs=1e-9), w1


def test_kneser_ney_engine_matches_brute_force(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in QUERIES["text_kneser_ney_lm"](spark, SF_DIR).collect()
    }
    docs = _docs()
    bg, c12, c1, n1h, n1t, b = _kn_model(docs)
    per_doc = bg.groupby("doc_id")
    assert set(got) == set(per_doc.groups)
    for doc_id, grp in per_doc:
        nll = sum(
            -math.log(_kn_prob(w1, w2, c12, c1, n1h, n1t, b))
            for w1, w2 in zip(grp["w1"], grp["w2"])
        )
        n_bg, avg_nll = got[doc_id]
        assert n_bg == len(grp)
        assert avg_nll == pytest.approx(nll / len(grp), abs=5e-4)


# -------------------------------------------------------------- overlap --
def test_source_overlap_matrix_brute_force(spark):
    rows = QUERIES["pipeline_source_overlap_matrix"](spark, SF_DIR).collect()
    docs = _docs()
    gram_sets: dict[str, set[str]] = {}
    for src, text in zip(docs["source"], docs["text"]):
        ts = text.split(" ")
        gram_sets.setdefault(src, set()).update(
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        )
    got = {(r["source_a"], r["source_b"]): r.asDict() for r in rows}
    srcs = sorted(gram_sets)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            common = gram_sets[sa] & gram_sets[sb]
            if not common:
                assert (sa, sb) not in got
                continue
            r = got.pop((sa, sb))
            union = len(gram_sets[sa]) + len(gram_sets[sb]) - len(common)
            assert r["grams_a"] == len(gram_sets[sa])
            assert r["grams_b"] == len(gram_sets[sb])
            assert r["grams_common"] == len(common)
            assert r["jaccard_permille"] == _round_half_away(
                1000.0 * len(common) / union
            )
    assert not got  # nothing reported that the brute force didn't find


# ---------------------------------------------------------------- drift --
def test_embedding_drift_brute_force(spark):
    rows = QUERIES["pipeline_embedding_drift"](spark, SF_DIR).collect()
    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    a = {
        lbl: np.stack(grp["embedding"].to_numpy()).astype("float64")
        for lbl, grp in emb.groupby("label")
    }
    kept = emb[emb["vec_id"] % 17 != 0].copy()

    def perturb(row):
        e = np.asarray(row["embedding"], dtype="float64")
        if row["vec_id"] % 5 == 0:
            e = e.copy()
            e[::16] = 0.0
        return e

    b = {
        lbl: np.stack([perturb(r) for _, r in grp.iterrows()])
        for lbl, grp in kept.groupby("label")
    }
    assert [r["label"] for r in rows] == sorted(a)
    for r in rows:
        ca = a[r["label"]].mean(axis=0)
        cb = b[r["label"]].mean(axis=0)
        cos = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        assert r["n_a"] == len(a[r["label"]])
        assert r["n_b"] == len(b[r["label"]])
        assert r["row_delta_permille"] == _round_half_away(
            1000.0 * (r["n_b"] - r["n_a"]) / r["n_a"]
        )
        assert r["centroid_cos"] == pytest.approx(cos, abs=2e-6)
        # a lossy re-encode of 1/5 of vectors must stay a small rotation
        assert r["centroid_cos"] > 0.9


# ------------------------------------------------------------- coverage --
def test_vocab_coverage_brute_force(spark):
    rows = QUERIES["text_vocab_coverage_curve"](spark, SF_DIR).collect()
    docs = _docs()
    from collections import Counter

    freq = Counter()
    for text in docs["text"]:
        freq.update(text.split(" "))
    total = sum(freq.values())
    # rank by (freq desc, tok asc) — the engine's tie-break
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r["k"] for r in rows] == [64, 256, 1024, 4096]
    prev_cov = -1
    for r in rows:
        top = ranked[: r["k"]]
        covered = sum(c for _, c in top)
        assert r["n_types_total"] == len(freq)
        assert r["types_used"] == min(r["k"], len(freq))
        assert r["covered_tokens"] == covered
        assert r["total_tokens"] == total
        assert r["coverage_permille"] == _round_half_away(1000.0 * covered / total)
        # coverage must be monotone in K
        assert r["coverage_permille"] >= prev_cov
        prev_cov = r["coverage_permille"]


# ---------------------------------------------------------------- heaps --
def test_heaps_fit_brute_force(spark):
    rows = {r["source"]: r.asDict()
            for r in QUERIES["text_heaps_fit"](spark, SF_DIR).collect()}
    docs = _docs().sort_values("doc_id")
    for src, grp in docs.groupby("source"):
        seen: set[str] = set()
        cum_toks = 0
        xs, ys = [], []
        for text in grp["text"]:
            ts = text.split(" ")
            cum_toks += len(ts)
            seen.update(ts)
            xs.append(math.log(cum_toks))
            ys.append(math.log(len(seen)))
        x, y = np.array(xs), np.array(ys)
        beta = float(np.polyfit(x, y, 1)[0])
        # engines' regr_r2 defines the constant-y (SStot = 0) case as a
        # perfect fit; corrcoef would give NaN there
        if len(x) < 2 or float(np.var(y)) == 0.0:
            r2 = 1.0
        else:
            r2 = float(np.corrcoef(x, y)[0, 1] ** 2)
        r = rows[src]
        assert r["n_docs"] == len(grp)
        assert r["beta_e4"] == pytest.approx(beta * 10000, abs=2)
        assert r["r2_e4"] == pytest.approx(r2 * 10000, abs=2)
        # natural-language vocabulary growth: beta in (0, 1) whenever the
        # vocabulary actually grew past the first doc (a saturated
        # source legitimately fits beta = 0)
        assert 0 <= r["beta_e4"] < 10000
        if len(set(ys)) > 1:
            assert r["beta_e4"] > 0


# --------------------------------------------------------------- impact --
def test_dedup_impact_brute_force(spark):
    import re as _re

    rows = {r["source"]: r.asDict()
            for r in QUERIES["pipeline_dedup_impact_report"](spark, SF_DIR).collect()}
    docs = _docs()
    corpus = [(int(d), s, t) for d, s, t in
              zip(docs["doc_id"], docs["source"], docs["text"])]
    corpus += [
        (int(d) + 300000, "mirror", t.replace(" ", "  ").upper() + " !!!")
        for d, t in zip(docs["doc_id"], docs["text"])
        if d % 9 == 0
    ]

    def canon(t: str) -> str:
        return _re.sub(" +", " ", _re.sub("[^a-z0-9 ]", "", t.lower())).strip()

    keeper: dict[str, int] = {}
    for d, _s, t in corpus:
        c = canon(t)
        keeper[c] = min(keeper.get(c, d), d)
    per_src: dict[str, list[tuple[int, int, bool]]] = {}
    for d, s, t in corpus:
        per_src.setdefault(s, []).append(
            (d, len(t.split(" ")), d != keeper[canon(t)])
        )
    assert set(rows) == set(per_src)
    for s, items in per_src.items():
        r = rows[s]
        assert r["n_docs"] == len(items)
        assert r["n_tokens"] == sum(n for _, n, _ in items)
        assert r["docs_removed"] == sum(1 for _, _, dup in items if dup)
        assert r["tokens_removed"] == sum(n for _, n, dup in items if dup)
        assert r["docs_removed_permille"] == _round_half_away(
            1000.0 * r["docs_removed"] / r["n_docs"]
        )
    # every mirror doc duplicates an original, so the mirror source must
    # be 100% removed
    assert rows["mirror"]["docs_removed_permille"] == 1000


# ------------------------------------------------------------ lifecycle --
def test_lifecycle_states_brute_force(spark):
    rows = {r["week"]: r.asDict()
            for r in QUERIES["events_lifecycle_states"](spark, SF_DIR).collect()}
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ts = pd.to_datetime(ev["ts"])
    week = (ts - pd.to_timedelta(ts.dt.dayofweek, unit="D")).dt.date
    uw = sorted(set(zip(ev["user_id"], week)))
    by_user: dict[int, list] = {}
    for u, w in uw:
        by_user.setdefault(u, []).append(w)
    import datetime as _dt

    max_w = max(w for _, w in uw)
    exp: dict = {}
    for u, weeks in by_user.items():
        for i, w in enumerate(weeks):
            e = exp.setdefault(w, dict(n_new=0, n_retained=0,
                                       n_resurrected=0, n_churned=0))
            if i == 0:
                e["n_new"] += 1
            elif weeks[i - 1] == w - _dt.timedelta(days=7):
                e["n_retained"] += 1
            else:
                e["n_resurrected"] += 1
            nxt = weeks[i + 1] if i + 1 < len(weeks) else None
            churn_w = w + _dt.timedelta(days=7)
            if (nxt is None or nxt > churn_w) and churn_w <= max_w:
                exp.setdefault(churn_w, dict(n_new=0, n_retained=0,
                                             n_resurrected=0, n_churned=0))
                exp[churn_w]["n_churned"] += 1
    assert set(rows) == set(exp)
    for w, e in exp.items():
        got = rows[w]
        for k, v in e.items():
            assert got[k] == v, (w, k)
    # growth accounting telescopes: WAU(w) - WAU(w-7) ==
    # new + resurrected - churned for every week after the first
    wau = {}
    for u, w in uw:
        wau[w] = wau.get(w, 0) + 1
    weeks_sorted = sorted(wau)
    for prev, cur in zip(weeks_sorted, weeks_sorted[1:]):
        if cur - prev == _dt.timedelta(days=7):
            r = rows[cur]
            assert wau[cur] - wau[prev] == (
                r["n_new"] + r["n_resurrected"] - r["n_churned"]
            )


# ----------------------------------------------------------- engagement --
def test_engagement_histogram_brute_force(spark):
    rows = QUERIES["events_engagement_histogram"](spark, SF_DIR).collect()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    days = pd.to_datetime(ev["ts"]).dt.date
    ad = pd.DataFrame({"u": ev["user_id"], "d": days}).drop_duplicates()
    per_user = ad.groupby("u").size()
    hist = per_user.value_counts().sort_index()
    total = len(per_user)
    assert [r["active_days"] for r in rows] == list(hist.index)
    running = 0
    for r in reversed(rows):
        running += r["n_users"]
        assert r["n_users"] == hist[r["active_days"]]
        assert r["share_permille"] == _round_half_away(
            1000.0 * r["n_users"] / total
        )
        assert r["at_least_permille"] == _round_half_away(
            1000.0 * running / total
        )
    assert sum(r["n_users"] for r in rows) == total


# --------------------------------------------------------------- shards --
def test_shard_assignment_brute_force(spark):
    rows = QUERIES["pipeline_shard_assignment"](spark, SF_DIR).collect()
    docs = _docs().sort_values("doc_id")
    n_toks = docs["text"].str.split(" ").str.len().to_numpy()
    total = int(n_toks.sum())
    width = -(-total // 8)  # ceil
    starts = np.concatenate([[0], np.cumsum(n_toks)[:-1]])
    shard = starts // width
    got = {r["shard_id"]: r.asDict() for r in rows}
    for sid in sorted(set(shard)):
        sel = shard == sid
        r = got[sid]
        assert r["n_docs"] == int(sel.sum())
        assert r["n_tokens"] == int(n_toks[sel].sum())
        assert r["min_doc_id"] == int(docs["doc_id"].to_numpy()[sel].min())
        assert r["max_doc_id"] == int(docs["doc_id"].to_numpy()[sel].max())
    assert len(got) == len(set(shard))
    # contiguity: shard id ranges must not interleave
    maxes = [got[s]["max_doc_id"] for s in sorted(got)]
    mins = [got[s]["min_doc_id"] for s in sorted(got)]
    assert all(m < n for m, n in zip(maxes, mins[1:]))
    # balance: every shard's token load is within one max-doc of width
    max_doc = int(n_toks.max())
    for r in got.values():
        assert r["n_tokens"] <= width + max_doc


# ------------------------------------------------------------ time-decay --
def test_attribution_time_decay_brute_force(spark):
    rows = {r["channel"]: r.asDict()
            for r in QUERIES["events_attribution_time_decay"](spark, SF_DIR).collect()}
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev["ts"] = pd.to_datetime(ev["ts"])
    purch = ev[ev["event_type"] == "purchase"]
    other = ev[ev["event_type"] != "purchase"]
    per_channel: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for _, p in purch.iterrows():
        win = other[(other["user_id"] == p["user_id"])
                    & (other["ts"] < p["ts"])
                    & (other["ts"] >= p["ts"] - pd.Timedelta(days=7))]
        if win.empty:
            counts["(direct)"] = counts.get("(direct)", 0) + 1
            per_channel.setdefault("(direct)", []).append(
                _round_half_away(p["value"] * 100000 * 1000000 / 1000000)
            )
            continue
        last = win.groupby("event_type")["ts"].max()
        w = {
            ch: _round_half_away(
                math.exp(-((p["ts"] - t).value / 1000) / 1e6 / 172800.0) * 1e6
            )
            for ch, t in last.items()
        }
        tot = sum(w.values())
        for ch, we in w.items():
            counts[ch] = counts.get(ch, 0) + 1
            per_channel.setdefault(ch, []).append(
                _round_half_away(p["value"] * 100000 * we / tot)
            )
    assert set(rows) == set(per_channel)
    total_attr = 0
    for ch, micros in per_channel.items():
        r = rows[ch]
        assert r["n_purchases"] == counts[ch]
        assert r["attributed_e2"] == _round_half_away(sum(micros) / 1000.0)
        total_attr += r["attributed_e2"]
    # conservation: total attributed value ~= total purchase value
    # (micro-cent floor loses < n_shares/1000 cents)
    total_e2 = purch["value"].sum() * 100
    assert abs(total_attr - total_e2) <= max(2, len(purch) * 5 / 100)


# --------------------------------------------------------------- entropy --
def test_entropy_rate_brute_force(spark):
    rows = {r["source"]: r.asDict()
            for r in QUERIES["text_entropy_rate"](spark, SF_DIR).collect()}
    docs = _docs()
    from collections import Counter

    for src, grp in docs.groupby("source"):
        uni: Counter = Counter()
        bg: Counter = Counter()
        for text in grp["text"]:
            ts = text.split(" ")
            uni.update(ts)
            bg.update(zip(ts, ts[1:]))
        n = sum(uni.values())
        h1 = -sum(c * math.log(c / n) for c in uni.values()) / n / math.log(2)
        c1: Counter = Counter()
        for (w1, _), c in bg.items():
            c1[w1] += c
        nb = sum(bg.values())
        h2 = (
            -sum(c * math.log(c / c1[w1]) for (w1, _), c in bg.items())
            / nb / math.log(2)
        )
        r = rows[src]
        assert r["n_tokens"] == n
        assert r["n_bigrams"] == nb
        assert r["unigram_bits_e4"] == pytest.approx(h1 * 10000, abs=2)
        assert r["cond_bits_e4"] == pytest.approx(h2 * 10000, abs=2)
        assert r["info_gain_e4"] == pytest.approx((h1 - h2) * 10000, abs=3)
        # conditioning can only reduce entropy
        assert r["cond_bits_e4"] <= r["unigram_bits_e4"]
        assert r["info_gain_e4"] >= 0


# --------------------------------------------------------------- benford --
def test_benford_audit_brute_force(spark):
    rows = {r["digit"]: r.asDict()
            for r in QUERIES["pipeline_benford_audit"](spark, SF_DIR).collect()}
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    price = li["l_extendedprice"]
    digits = price[price >= 1].apply(lambda x: int(str(int(math.floor(x)))[0]))
    total = len(digits)
    from collections import Counter

    hist = Counter(digits)
    assert set(rows) == set(hist)
    for d, n in hist.items():
        r = rows[d]
        assert r["n_rows"] == n
        assert r["observed_permille"] == _round_half_away(1000.0 * n / total)
        assert r["benford_permille"] == _round_half_away(
            1000.0 * math.log10(1 + 1.0 / d)
        )
        assert r["delta_permille"] == r["observed_permille"] - r["benford_permille"]
    assert sum(r["n_rows"] for r in rows.values()) == total


# ------------------------------------------------------------ k-anonymity --
def test_k_anonymity_brute_force(spark):
    rows = {r["class_size_band"]: r.asDict()
            for r in QUERIES["pipeline_k_anonymity_audit"](spark, SF_DIR).collect()}
    docs = _docs()
    qi = docs.groupby(
        ["lang", "source", docs["n_chars"] // 100]
    ).size()
    from collections import Counter

    bands: Counter = Counter()
    docs_in: Counter = Counter()
    for size in qi:
        band = ("1 (unique)" if size == 1 else "2-4 (small)" if size < 5
                else "5-19" if size < 20 else "20+")
        bands[band] += 1
        docs_in[band] += size
    assert set(rows) == set(bands)
    for band, n_classes in bands.items():
        r = rows[band]
        assert r["n_classes"] == n_classes
        assert r["n_docs"] == docs_in[band]
        assert r["at_risk"] == (band in ("1 (unique)", "2-4 (small)"))
    assert sum(r["n_docs"] for r in rows.values()) == len(docs)


# ------------------------------------------------------- cluster histogram --
def test_cluster_size_histogram_consistent_with_cc(spark):
    hist = QUERIES["dedup_cluster_size_histogram"](spark, SF_DIR).collect()
    labels = QUERIES["dedup_cluster_cc"](spark, SF_DIR).collect()
    from collections import Counter

    comp_sizes = Counter(r["component"] for r in labels)
    size_hist = Counter(comp_sizes.values())
    assert {r["cluster_size"]: r["n_clusters"] for r in hist} == dict(size_hist)
    for r in hist:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]
    # total docs across the histogram equals the label-table height
    assert sum(r["n_docs"] for r in hist) == len(labels)


# ------------------------------------------------------------------- jsd --
def test_jsd_brute_force(spark):
    rows = {(r["source_a"], r["source_b"]): r.asDict()
            for r in QUERIES["text_jsd_source_divergence"](spark, SF_DIR).collect()}
    docs = _docs()
    from collections import Counter

    dist: dict[str, Counter] = {}
    for src, text in zip(docs["source"], docs["text"]):
        dist.setdefault(src, Counter()).update(text.split(" "))
    srcs = sorted(dist)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            ca, cb = dist[sa], dist[sb]
            na, nb = sum(ca.values()), sum(cb.values())
            jsd = 0.0
            for tok in set(ca) | set(cb):
                p = ca.get(tok, 0) / na
                q = cb.get(tok, 0) / nb
                m = (p + q) / 2
                if p:
                    jsd += 0.5 * p * math.log(p / m)
                if q:
                    jsd += 0.5 * q * math.log(q / m)
            r = rows[(sa, sb)]
            assert r["n_common_types"] == len(set(ca) & set(cb))
            assert r["jsd_bits_e4"] == pytest.approx(
                jsd / math.log(2) * 10000, abs=2
            )
            # bounded in [0, 1] bit
            assert 0 <= r["jsd_bits_e4"] <= 10000


# -------------------------------------------------------- degree profile --
def test_degree_distribution_consistent_with_graph_ops(spark):
    """The histogram must tally exactly the degree table the triangle/
    link-prediction ops orient by: recompute degrees from the raw
    events with the same cell-cap rule."""
    rows = QUERIES["events_degree_distribution"](spark, SF_DIR).collect()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev["h"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    cells = ev[["event_type", "h", "user_id"]].drop_duplicates()
    cells = (
        cells.sort_values("user_id")
        .groupby(["event_type", "h"])
        .head(16)
    )
    from collections import Counter
    from itertools import combinations

    pair_w: Counter = Counter()
    for _, grp in cells.groupby(["event_type", "h"]):
        for u, v in combinations(sorted(grp["user_id"]), 2):
            pair_w[(u, v)] += 1
    deg: Counter = Counter()
    for (u, v), w in pair_w.items():
        if w >= 4:
            deg[u] += 1
            deg[v] += 1
    hist = Counter(deg.values())
    assert {r["degree"]: r["n_nodes"] for r in rows} == dict(hist)
    # the fit is constant across rows and finite
    slopes = {r["slope_e4"] for r in rows}
    r2s = {r["r2_e4"] for r in rows}
    assert len(slopes) == 1 and len(r2s) == 1
    assert sum(r["n_nodes"] for r in rows) == len(deg)


# ----------------------------------------------------------------- phash --
def _stride_parity_chunks(data: bytes) -> list[int]:
    import numpy as np

    a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    pad = (-len(a)) % 64
    if pad:
        a = np.concatenate([a, np.zeros(pad, dtype=np.int64)])
    bits = a.reshape(-1, 64).sum(axis=0) & 1
    return [int((bits[16 * k : 16 * k + 16] * (1 << np.arange(16))).sum())
            for k in range(4)]


def test_phash_neardup_brute_force(spark):
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in QUERIES["multimodal_phash_neardup"](spark, SF_DIR).collect()}
    docs = _docs()
    en = docs[docs["lang"] == "en"]
    corpus = {int(d): t.encode() for d, t in zip(en["doc_id"], en["text"])}
    corpus.update({
        int(d) + 500000: (t[:10] + "Z" + t[11:]).encode()
        for d, t in zip(en["doc_id"], en["text"]) if d % 7 == 0
    })
    chunks = {d: _stride_parity_chunks(p) for d, p in corpus.items()}
    ids = sorted(chunks)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # banding: at least one identical chunk at the same index
            if not any(x == y for x, y in zip(chunks[a], chunks[b])):
                continue
            ham = sum(bin(x ^ y).count("1")
                      for x, y in zip(chunks[a], chunks[b]))
            if ham <= 3:
                expected[(a, b)] = ham
    assert rows == expected
    # every planted single-char edit differs in at most one stride parity
    for d in corpus:
        if d >= 500000 and (d - 500000) in chunks:
            ham = sum(bin(x ^ y).count("1") for x, y in
                      zip(chunks[d], chunks[d - 500000]))
            assert ham <= 1
            assert (d - 500000, d) in rows


# ----------------------------------------------------- concurrency key --
def _concurrency_fixture(tmp_path, offset: int) -> str:
    """Sessions engineered so several start/end endpoints share exact
    timestamps across users — the regime where the sweep's composite
    ordering key must stay UNIQUE (lpad truncation at 6 digits merged
    keys once user ids passed 1e6)."""
    rows = []
    eid = 0
    for u in range(12):
        uid = offset + u
        for s in range(3):
            base = pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(
                hours=2 * s
            )
            for m in (0, 5, 10):
                rows.append((eid, base + pd.Timedelta(minutes=m), uid,
                             "view", 1.0, "{}"))
                eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = tmp_path / f"conc{offset}"
    out.mkdir()
    df.to_parquet(out / "events.parquet", index=False)
    return str(out)


def test_concurrency_curve_id_translation_invariance(spark, tmp_path):
    """The hourly concurrency curve depends only on interval geometry,
    never on user-id magnitude: shifting every id by +1e12 (ids far past
    any fixed-width pad) must leave the curve bit-identical. The former
    6-digit lpad key truncated those ids to their FIRST six digits —
    all '100000' at +1e12 — collapsing the prefix-scan order to
    duplicate keys."""
    small = QUERIES["events_concurrency_curve"](
        spark, _concurrency_fixture(tmp_path, 1)
    ).collect()
    huge = QUERIES["events_concurrency_curve"](
        spark, _concurrency_fixture(tmp_path, 10**12)
    ).collect()
    assert [tuple(r) for r in small] == [tuple(r) for r in huge]
    assert len(small) > 0
    # 12 users all concurrently in session during each burst
    assert max(r["peak_concurrency"] for r in small) == 12


# ---------------------------------------------------------------- basket --
def test_market_basket_brute_force(spark):
    rows = {(r["brand_a"], r["brand_b"]): r.asDict()
            for r in QUERIES["pipeline_market_basket"](spark, SF_DIR).collect()}
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    part = pd.read_parquet(os.path.join(SF_DIR, "part.parquet"))
    ob = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_orders = ob["l_orderkey"].nunique()
    singles = ob.groupby("p_brand").size()
    from collections import Counter
    from itertools import combinations

    pair_n: Counter = Counter()
    for _, grp in ob.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["p_brand"]), 2):
            pair_n[(a, b)] += 1
    expected = {k: v for k, v in pair_n.items() if v >= 20}
    assert set(rows) == set(expected)
    for (a, b), n_ab in expected.items():
        r = rows[(a, b)]
        assert r["n_ab"] == n_ab
        assert r["n_a"] == singles[a]
        assert r["n_b"] == singles[b]
        assert r["lift_e4"] == _round_half_away(
            10000.0 * n_ab * n_orders / (singles[a] * singles[b])
        )
        assert r["confidence_a_to_b_permille"] == _round_half_away(
            1000.0 * n_ab / singles[a]
        )


# ----------------------------------------------------------- seasonality --
def test_hourly_seasonality_brute_force(spark):
    rows = QUERIES["events_hourly_seasonality"](spark, SF_DIR).collect()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ts = pd.to_datetime(ev["ts"])
    cells = (
        pd.DataFrame({"dow": ts.dt.dayofweek + 1, "hour": ts.dt.hour})
        .groupby(["dow", "hour"]).size()
    )
    total = int(cells.sum())
    got = {(r["dow"], r["hour"]): r.asDict() for r in rows}
    assert set(got) == set(cells.index)
    dow_tot = cells.groupby(level=0).sum()
    for (dow, hour), n in cells.items():
        r = got[(dow, hour)]
        assert r["n_events"] == n
        assert r["dow_share_permille"] == _round_half_away(
            1000.0 * n / dow_tot[dow]
        )
        assert r["global_share_e4"] == _round_half_away(10000.0 * n / total)
    # exactly one peak per weekday, and it carries that weekday's max
    for dow in dow_tot.index:
        peaks = [r for (d, _), r in got.items() if d == dow and r["is_dow_peak"]]
        assert len(peaks) == 1
        assert peaks[0]["n_events"] == cells[dow].max()
