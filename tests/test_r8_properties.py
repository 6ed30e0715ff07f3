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
