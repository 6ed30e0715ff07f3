"""Mergeability of the bottom-k (KMV) sketch state fold: replaying the
same rows as ONE batch or as ANY split into successive batches must
produce the identical final state and summary — the property that makes
the sketch safe under arbitrary micro-batch boundaries (and, on a real
cluster, under state-store repartitioning)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from minimised_impala_spark.streaming.stateful import SKETCH_K, _sketch_group


class _FakeState:
    """The three GroupState members _sketch_group touches."""

    def __init__(self) -> None:
        self._v = None

    @property
    def exists(self) -> bool:
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


def _frame(rows):
    return pd.DataFrame(
        {"prio": [p for p, _ in rows], "vc": [v for _, v in rows]}
    )


def _run(batches):
    st = _FakeState()
    last = None
    for rows in batches:
        if not rows:
            continue
        for out in _sketch_group(("click",), [_frame(rows)], st):
            last = out
    return st._v, last


def _rows(n, seed):
    rng = random.Random(seed)
    return [(rng.randrange(1 << 60), rng.randrange(-500, 50000)) for _ in range(n)]


@pytest.mark.parametrize("n_batches", [2, 3, 7])
@pytest.mark.parametrize("seed", [1, 99])
def test_sketch_fold_is_batch_invariant(n_batches, seed):
    rows = _rows(300, seed)
    one_state, one_out = _run([rows])
    rng = random.Random(seed + 1)
    shuffled = rows[:]
    rng.shuffle(shuffled)  # arrival order must not matter either
    cuts = sorted(rng.randrange(len(rows)) for _ in range(n_batches - 1))
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        batches.append(shuffled[prev:c])
        prev = c
    many_state, many_out = _run(batches)
    assert one_state == many_state
    pd.testing.assert_frame_equal(one_out, many_out)


def test_sketch_keeps_exactly_k_and_exact_moments():
    rows = _rows(1000, 7)
    state, out = _run([rows])
    prios, vals, n, mn, mx = state
    assert len(prios) == SKETCH_K and len(vals) == SKETCH_K
    assert n == 1000
    assert mn == min(v for _, v in rows) and mx == max(v for _, v in rows)
    # the kept set IS the bottom-K by (prio, val) — a deterministic
    # uniform sample, independent of arrival order
    expect = sorted(rows)[:SKETCH_K]
    assert list(zip(prios, vals)) == expect
    assert out["sample_n"].iloc[0] == SKETCH_K


def test_sketch_small_group_keeps_everything():
    rows = _rows(5, 3)
    state, out = _run([rows])
    prios, vals, n, mn, mx = state
    assert n == 5 and len(prios) == 5
    sample = sorted(vals)
    assert out["est_p50_cents"].iloc[0] == sample[(5 - 1) // 2]


def _cm_run(batches):
    from minimised_impala_spark.streaming.stateful import _cm_group

    st = _FakeState()
    last = None
    for rows in batches:
        if not rows:
            continue
        for out in _cm_group(("click",), [pd.DataFrame({"user_id": rows})], st):
            last = out
    return st._v, last


@pytest.mark.parametrize("n_batches", [2, 3, 7])
@pytest.mark.parametrize("seed", [1, 99])
def test_cm_fold_is_batch_invariant(n_batches, seed):
    rng = random.Random(seed)
    rows = [rng.randrange(0, 5000) for _ in range(400)]
    one_state, one_out = _cm_run([rows])
    cuts = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
    batches = [
        rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])
    ]
    split_state, split_out = _cm_run(batches)
    assert one_state == split_state
    assert one_out.equals(split_out)
