"""Sweep cut — local community extraction from a diffusion score vector
(Andersen–Chung–Lang 2006 local clustering): rank vertices by
score/degree, evaluate the conductance of every prefix, return the
best-conductance prefix as the community.

This is the missing half of personalized PageRank (operators/ppr.py):
PPR says WHICH vertices are close to the seeds; the sweep cut turns that
into an actual community with a quality certificate (its conductance).
ACL's theorem is that some prefix of the p(v)/deg(v) ordering is a
provably good cut — so the operator only ever inspects prefixes, never
the 2^n subsets.

Relational formulation (all exact-integer except the two divisions):
  1. canonical undirected simple graph; deg(v); 2m = Σ deg (scalar).
  2. support = score rows joined to deg, ratio = score/deg (double),
     rank = row_number over (ratio DESC, vertex ASC) — a GLOBAL window,
     but over the SUPPORT ONLY, which is bounded by construction: a
     diffusion vector's support (PPR with restart has support
     O(1/(α·ε))), further capped by ``top_n``. This is the same
     bounded-global-window envelope as stats.largest_k, not a scan-wide
     sort.
  3. vol_k = running Σ deg over the rank order (window cumsum).
  4. internal edges: an edge (u, v) with both endpoints ranked becomes
     internal at k = max(r_u, r_v) — one join + groupBy(rmax), then a
     running Σ of 2·count joins back onto the prefix table. Edges with
     an unranked endpoint never enter (they stay boundary), which is
     exactly cut_k = vol_k − 2·|E(S_k)|.
  5. φ_k = cut_k / min(vol_k, 2m − vol_k) (NULL when the denominator is
     0 — the full-graph / empty prefixes carry no cut information).
  6. best prefix = min φ, ties to the SMALLEST k; community = ranks ≤ k.

Determinism / oracle: with scores pre-rounded (the gate feeds
ROUND(PPR, 8), the same contract `ppr_bipartite` pins), every ordering
key and both divisions have bit-identical operands in Spark and DuckDB,
so the whole prefix table hash-matches a plain windowed-SQL replay
(`driver_queries._sweepcut_sql` → `sweepcut_ppr_bipartite` gate row).

Scale shape: one edge-sized join against the (small, broadcastable)
rank table, one groupBy(rmax), two windows over the support — the graph
is touched once; nothing global beyond the support sort and two scalar
aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class SweepCutResult:
    # (rank, vertex, ratio, vol, cut, conductance) for every prefix
    prefixes: DataFrame
    # (vertex, rank) members of the best-conductance prefix
    community: DataFrame
    best_k: int
    best_conductance: float | None


def sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    scores: DataFrame,
    *,
    score_col: str = "score",
    top_n: int | None = None,
) -> SweepCutResult:
    """ACL sweep cut over ``edges`` (src/dst, any orientation; treated as
    an undirected simple graph) ranked by ``scores[score_col]`` / degree.

    ``scores``: (vertex, score) — only vertices with score > 0 AND at
    least one edge enter the sweep (zero-score or isolated vertices can
    never improve a conductance prefix). ``top_n`` caps the sweep depth.
    """
    s = F.col("src").cast("long")
    d = F.col("dst").cast("long")
    e = (
        edges.select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("deg"))
    )
    two_m_row = deg.agg(F.sum("deg").alias("s")).collect()[0]  # scalar only
    two_m = int(two_m_row["s"] or 0)
    empty_pref = spark.createDataFrame(
        [],
        "rank int, vertex long, ratio double, vol long, cut long,"
        " conductance double",
    )
    if two_m == 0:
        return SweepCutResult(
            empty_pref, empty_pref.select("vertex", "rank"), 0, None
        )

    sup = (
        scores.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col(score_col).cast("double").alias("score"),
        )
        .where(F.col("score") > 0)
        .join(deg, "vertex")
        .select(
            "vertex", "deg", (F.col("score") / F.col("deg")).alias("ratio")
        )
    )
    wr = Window.orderBy(F.col("ratio").desc(), F.col("vertex").asc())
    ranks = sup.withColumn("rank", F.row_number().over(wr))
    if top_n is not None:
        ranks = ranks.where(F.col("rank") <= top_n)
    ranks = ranks.persist()

    ru = ranks.select(F.col("vertex").alias("u"), F.col("rank").alias("ru"))
    rv = ranks.select(F.col("vertex").alias("v"), F.col("rank").alias("rv"))
    per_r = (
        e.join(ru, "u")
        .join(rv, "v")
        .groupBy(F.greatest("ru", "rv").alias("rank"))
        .agg((2 * F.count("*")).alias("w2"))
    )
    wk = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    pref = (
        ranks.join(per_r, "rank", "left")
        .withColumn("vol", F.sum("deg").over(wk))
        .withColumn("int2", F.sum(F.coalesce("w2", F.lit(0))).over(wk))
        .select(
            "rank",
            "vertex",
            "ratio",
            F.col("vol").cast("long").alias("vol"),
            (F.col("vol") - F.col("int2")).cast("long").alias("cut"),
            F.when(
                F.least(F.col("vol"), F.lit(two_m) - F.col("vol")) > 0,
                (F.col("vol") - F.col("int2"))
                / F.least(F.col("vol"), F.lit(two_m) - F.col("vol")),
            ).alias("conductance"),
        )
        .persist()
    )

    best = (
        pref.where(F.col("conductance").isNotNull())
        .orderBy(F.col("conductance").asc(), F.col("rank").asc())
        .select("rank", "conductance")
        .limit(1)
        .collect()
    )
    if not best:
        return SweepCutResult(pref, empty_pref.select("vertex", "rank"), 0, None)
    best_k = int(best[0]["rank"])
    best_phi = float(best[0]["conductance"])
    community = pref.where(F.col("rank") <= best_k).select("vertex", "rank")
    return SweepCutResult(pref, community, best_k, best_phi)
