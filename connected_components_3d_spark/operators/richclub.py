"""Rich-club coefficient — for each degree threshold k, the edge density
among the vertices of degree > k:  φ(k) = 2·E_k / (N_k·(N_k−1)) where
N_k = |{v : deg(v) > k}| and E_k = |{(u,v) ∈ E : deg(u) > k ∧ deg(v) > k}|
(Zhou & Mondragón 2004; Colizza et al. 2006). On a link graph this is the
standard "do the hubs interconnect?" diagnostic — a high φ at large k is
the signature of a tightly-wired core (or a link farm).

This is the UNcorrected φ(k); the normalized variant divides by a rewired
null-model ensemble, which is stochastic by construction and out of scope
for a hash-exact engine (documented, not implemented).

Exactness trick that makes it one histogram fold instead of a per-k scan:
an edge belongs to E_k iff min(deg u, deg v) > k, so two tiny histograms
suffice — nodes per degree and edges per min-endpoint-degree — and both
N_k and E_k are strictly-greater suffix sums over them, evaluated at every
observed node degree (φ is step-constant between observed degrees, and
every edge min-degree IS some node's degree, so that grid is complete).

Scale shape: hygiene + degree join are E-sized equi-joins on vertex ids
(the degree side is V-sized); everything after is a ≤|distinct degrees|
row histogram (≲10⁴ rows even at 100 TB — power-law graphs have ~√E
distinct degrees), where a single global window IS the right plan — the
data is already reduced. No Python.

The driver gate hash-compares a plain-SQL replay over the co-part graph
(`richclub_copart`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rich_club(edges: DataFrame) -> DataFrame:
    """φ(k) per observed node degree k:
    (k:long, n_nodes:long, n_edges:long, phi:double·6dp); rows with
    N_k < 2 (φ undefined) are omitted. Input treated as undirected simple
    (self-loops dropped, duplicates/orientation collapsed)."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    em = (
        e.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(F.least("du", "dv").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("cnt_e"))
    )
    nh = deg.groupBy("d").agg(F.count("*").alias("cnt_n"))
    grid = nh.join(em, nh.d == em.m, "left").select(
        F.col("d").cast("long").alias("k"),
        "cnt_n",
        F.coalesce("cnt_e", F.lit(0)).alias("cnt_e"),
    )
    # tiny-table fold: |grid| = #distinct degrees (module docstring)
    w = (
        Window.orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "k",
        (F.sum("cnt_n").over(w) - F.col("cnt_n")).alias("n_nodes"),
        (F.sum("cnt_e").over(w) - F.col("cnt_e")).alias("n_edges"),
    )
    return cum.where(F.col("n_nodes") >= 2).select(
        "k",
        "n_nodes",
        "n_edges",
        # N·(N−1) through double (exact to 2⁵³ per factor) so the pair
        # count can't overflow int64 at extreme N; both engines IEEE-agree
        F.round(
            (2.0 * F.col("n_edges"))
            / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - F.lit(1))),
            6,
        ).alias("phi"),
    )


def rich_club_single_node(
    pairs: list[tuple[int, int]],
) -> dict[int, tuple[int, int, float]]:
    """Single-node reference: {k: (n_nodes, n_edges, phi·6dp)} for every
    observed node degree k with N_k ≥ 2."""
    from collections import Counter

    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg: Counter[int] = Counter()
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    out: dict[int, tuple[int, int, float]] = {}
    for k in sorted(set(deg.values())):
        rich = {x for x, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for u, v in es if u in rich and v in rich)
        out[k] = (
            len(rich),
            ek,
            round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6),
        )
    return out
