"""Incremental connected components: maintain a min-id CC labeling under a
batch of NEW edges without touching the full edge table — the daily-crawl
delta workflow at web scale (yesterday's 10^12-page labeling + today's new
href edges), where re-running CC over the union would redo O(E · diameter)
work for a delta that only merges a handful of components.

Correctness (why label-space CC is exact): let ``assignment`` be a CANONICAL
labeling of the old graph G — every vertex maps to the MIN vertex id of its
component (exactly what operators/cc.py emits). Contract each old component
to its label and add every new edge with endpoints rewritten to labels
(vertices the old assignment doesn't know label themselves). Connected
components of that DELTA GRAPH (≤ 2·|ΔE| vertices, ≤ |ΔE| edges — it only
contains labels incident to a new edge) are exactly the merge classes of
G ∪ ΔE, and since each old label IS the min member id of its old component
and unseen vertices carry their own id, the min label of a merge class IS
the min member id of the merged component. Relabeling the old assignment
through the delta map (and appending self-labeled new vertices) therefore
reproduces, bit for bit, what a full CC run over G ∪ ΔE would emit.

Scale shape: the full edge table is never read. One label-annotate join of
ΔE against the V-sized assignment (AQE broadcasts ΔE when small), a CC run
over the label-sized delta graph (hash-min; depth = merge-chain diameter,
typically 1–2 supersteps), then ONE V-sized relabel join against a merge
map of ≤ 2·|ΔE| rows — broadcast, so no shuffle of the assignment at all
when the delta is small. Total: O(|ΔE| + V) vs O(E · diameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc import CCResult, connected_components


def incremental_components(
    spark: SparkSession,
    assignment: DataFrame,
    new_edges: DataFrame,
    **cc_kwargs,
) -> CCResult:
    """Update the canonical (vertex, component = min member id) labeling
    ``assignment`` with the edge batch ``new_edges`` (src, dst). Returns a
    CCResult whose ``components`` equals a full CC run over old ∪ new —
    including rows for brand-new vertices that only appear in ``new_edges``.
    ``cc_kwargs`` are forwarded to the delta-graph CC call (default
    hash-min — the delta graph is label-sized, so the relational kernel is
    the right tool)."""
    e = (
        new_edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    a = assignment.select(
        F.col("vertex").cast("long"), F.col("component").cast("long")
    )
    # rewrite endpoints to old labels; unknown endpoints label themselves
    lsrc = a.select(F.col("vertex").alias("src"), F.col("component").alias("ls"))
    ldst = a.select(F.col("vertex").alias("dst"), F.col("component").alias("ld"))
    delta_edges = (
        e.join(lsrc, "src", "left")
        .join(ldst, "dst", "left")
        .select(
            F.coalesce("ls", "src").alias("src"),
            F.coalesce("ld", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    if delta_edges.isEmpty():
        # nothing merges; still append self-labeled brand-new vertices (a
        # delta of only self-loops / intra-component edges lands here)
        new_vs = (
            e.select(F.col("src").alias("vertex"))
            .union(e.select(F.col("dst").alias("vertex")))
            .distinct()
            .join(a.select("vertex"), "vertex", "left_anti")
            .select("vertex", F.col("vertex").alias("component"))
        )
        return CCResult(a.unionByName(new_vs), 0, [])
    cc_kwargs.setdefault("method", "hashmin")
    delta = connected_components(spark, delta_edges, **cc_kwargs)
    # merge map over old labels: non-identity rows only (identity relabels
    # are the common case and shouldn't ride the broadcast)
    merge_map = delta.components.where(
        F.col("vertex") != F.col("component")
    ).select(
        F.col("vertex").alias("component"), F.col("component").alias("newc")
    )
    relabeled = (
        a.join(F.broadcast(merge_map), "component", "left")
        .select("vertex", F.coalesce("newc", "component").alias("component"))
    )
    # brand-new vertices: endpoints of ΔE the old assignment doesn't know —
    # their delta-graph label IS their vertex id, so the delta result already
    # carries their final component
    new_vs = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .join(a.select("vertex"), "vertex", "left_anti")
    )
    new_rows = (
        new_vs.join(
            delta.components.withColumnRenamed("component", "newc"), "vertex"
        )
        .select("vertex", F.col("newc").alias("component"))
    )
    out = relabeled.unionByName(new_rows)
    return CCResult(out, delta.num_supersteps, delta.metrics)
