"""Butterfly counting — the bipartite analogue of triangle counting: a
butterfly is a 2×2 biclique (u1, u2 → v1, v2, all four edges present), the
smallest cohesion motif a bipartite graph can have (Sanei-Mehri, Sariyüce,
Tirthapura, KDD 2018). On web data the host↔page or page↔anchor-text
bipartite graphs are butterfly-dense exactly where templated/spam link
farms live, so per-vertex butterfly counts are a standard farm signal.

Counting identity (exact): every butterfly contains exactly one pair of
same-side vertices on EACH side, so with c(v1, v2) = |N(v1) ∩ N(v2)| over
same-side pairs,

    butterflies(v)  = Σ_{v' on v's side} C(c(v, v'), 2)
    total           = Σ_{v1 < v2}        C(c(v1, v2), 2)

i.e. one fold over the co-citation pair table (operators/cocitation.py —
the ``side='dst'`` pairs) or the bibliographic-coupling table
(``side='src'``). Integer-only, so the driver gate hash-compares a plain
two-self-join SQL replay (`butterflies_bipartite`).

Scale shape: identical to cocitation's — the pair generator is the one
self-join on the shared endpoint, and the same ``max_fanout`` hub cap
bounds the C(D, 2) wedge blow-up BEFORE the join (a 10^6-degree hub alone
would otherwise emit 5·10^11 wedge rows; capped generators carry no
similarity signal — module-docstring rationale there). The butterfly fold
itself is a vertex-keyed SUM over the surviving pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def butterflies(
    spark: SparkSession,
    edges: DataFrame,
    *,
    side: str = "dst",
    max_fanout: int = 256,
) -> DataFrame:
    """Per-vertex butterfly counts for the ``side`` ∈ {'src','dst'}
    partition of the bipartite edge table (duplicates/self-loops dropped).
    Generator vertices on the OTHER side with degree > ``max_fanout`` are
    excluded before pair generation (the cocitation hub cap — counts are
    then exact on the capped graph). Output: (vertex:long,
    butterflies:long), vertices with zero butterflies omitted."""
    if side not in ("src", "dst"):
        raise ValueError(f"butterflies: bad side {side!r}")
    gen_col, pair_col = ("src", "dst") if side == "dst" else ("dst", "src")
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    gen = (
        e.groupBy(gen_col)
        .agg(F.count("*").alias("_fan"))
        .where(F.col("_fan") <= max_fanout)
        .select(gen_col)
    )
    ec = e.join(gen, gen_col, "left_semi")
    pairs = (
        ec.alias("l")
        .join(ec.alias("r"), F.col(f"l.{gen_col}") == F.col(f"r.{gen_col}"))
        .where(F.col(f"l.{pair_col}") < F.col(f"r.{pair_col}"))
        .groupBy(
            F.col(f"l.{pair_col}").alias("a"),
            F.col(f"r.{pair_col}").alias("b"),
        )
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select(
            "a", "b", (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("bf")
        )
    )
    return (
        pairs.select(F.col("a").alias("vertex"), "bf")
        .unionByName(pairs.select(F.col("b").alias("vertex"), "bf"))
        .groupBy("vertex")
        .agg(F.sum("bf").alias("butterflies"))
    )


def butterfly_total(
    spark: SparkSession,
    edges: DataFrame,
    *,
    side: str = "dst",
    max_fanout: int = 256,
) -> int:
    """Total butterfly count (each counted once). Folding either side's
    pair table gives the same number — the identity in the module
    docstring; tests assert the cross-side agreement."""
    per_v = butterflies(spark, edges, side=side, max_fanout=max_fanout)
    # each butterfly contributes to exactly 2 vertices on this side
    row = per_v.agg((F.sum("butterflies") / 2).cast("long").alias("t")).collect()
    return row[0]["t"] or 0


def butterflies_single_node(
    pairs: list[tuple[int, int]], *, side: str = "dst", max_fanout: int = 256
) -> dict[int, int]:
    """Single-node reference for the pytest parity oracle."""
    from collections import defaultdict
    from itertools import combinations

    es = {(a, b) for a, b in pairs if a != b}
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in es:
        g, p = (s, d) if side == "dst" else (d, s)
        nbrs[g].add(p)
    common: dict[tuple[int, int], int] = defaultdict(int)
    for g, ps in nbrs.items():
        if len(ps) > max_fanout:
            continue
        for a, b in combinations(sorted(ps), 2):
            common[(a, b)] += 1
    out: dict[int, int] = defaultdict(int)
    for (a, b), c in common.items():
        bf = c * (c - 1) // 2
        if bf:
            out[a] += bf
            out[b] += bf
    return dict(out)
