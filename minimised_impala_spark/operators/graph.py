"""Distributed connected components — the scale path from pairwise
duplicate candidates (LSH/SimHash output) to duplicate *clusters*.

No reference analogue (the reference is pure SQL OLAP); this is a
north-star training-data operator: near-dup pairs are edges, a cluster is
a connected component, and the kept document is the component minimum.

Algorithm: iterative min-label propagation with pointer jumping
(label(v) ← label(label(v)) each round), the classic PRAM/MapReduce
formulation (cf. Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — our variant is their hash-to-min specialisation).
Each iteration is two hash joins + one groupBy on (node) keys; pointer
jumping halves remaining path lengths, so rounds = O(log diameter) —
dup-cluster graphs have tiny diameters, so 3-5 rounds in practice.

Scale notes: every step is a key-partitioned shuffle of (id, comp) pairs
— 16 bytes a row regardless of document size. `localCheckpoint` truncates
the plan each round; without it the iterated lineage makes Catalyst
re-analyze an exponentially growing tree (the classic iterative-DataFrame
trap). Edge lists at 100 TB corpus scale are ~|near-dup pairs|, orders of
magnitude smaller than the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Return (id, comp) with comp = min node id of the component.

    ``edges`` is an undirected edge list; isolated nodes (absent from
    ``edges``) are absent from the result — union them in afterwards if
    singleton clusters are wanted.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=False)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))

    for _ in range(max_iter):
        # 1. neighbour-min: comp'(v) = min(comp(v), min_{u~v} comp(u))
        nbr_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels.id == nbr_min.a, "left").select(
            labels.id,
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
        )
        # 2. pointer jumping: comp''(v) = comp'(comp'(v)); min labels are
        # always node ids, so the self-join is total.
        ptr = stepped.select(F.col("id").alias("cid"), F.col("comp").alias("ccomp"))
        jumped = (
            stepped.join(ptr, stepped.comp == ptr.cid)
            .select("id", F.col("ccomp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels
