"""TrustRank and spam mass — link-spam demotion signals (Gyöngyi,
Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank", VLDB 2004;
Gyöngyi et al., "Link Spam Detection Based on Mass Estimation", VLDB 2006).

TrustRank IS personalized PageRank seeded on a hand-vetted trusted set —
trust flows out of the seeds along out-links with damping, so pages
reachable only through spam farms receive ~none. This module is therefore a
thin composition over the gated kernels (operators/pagerank.py,
operators/ppr.py): no new iteration machinery, no new shuffle shapes — the
cost envelope is exactly one PageRank run + one PPR run, both of which
already carry the 100 TB design (int-packed ids, shuffle-once sorted edge
cache, vertex-sized per-iteration aggregates, salted skew paths).

Spam mass (the 2006 paper's relative-mass estimator, with the whole trusted
set as the "good core" and both score vectors L1-normalized to 1):

    rel_spam_mass(v) = (pr(v) − trust(v)) / pr(v)

— the fraction of v's PageRank NOT accounted for by trust flowing from the
good core. Near 1 ⇒ rank earned almost entirely from un-trusted regions
(spam-farm shaped); ≤ 0 ⇒ trusted seeds over-account for it (whitelisted
neighborhoods). Both inputs are rounded to 8 places BEFORE differencing so
the Spark and DuckDB oracle sides difference identical quantities (driver
gate row ``spam_mass_bipartite``).

Output: (vertex:long, rank:double, trust:double, rel_spam_mass:double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pagerank import pagerank
from .ppr import personalized_pagerank


def trustrank(
    spark: SparkSession,
    edges: DataFrame,
    trusted_seeds: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> DataFrame:
    """TrustRank scores: personalized PageRank with the teleport (and
    dangling-mass return) distribution uniform over ``trusted_seeds``
    (one-column ``vertex`` DataFrame). Returns (vertex:long, trust:double),
    L1-normalized to 1 at convergence."""
    res = personalized_pagerank(
        spark,
        edges,
        trusted_seeds,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        fixed_iters=fixed_iters,
    )
    return res.ranks.select("vertex", F.col("rank").alias("trust"))


def spam_mass(
    spark: SparkSession,
    edges: DataFrame,
    trusted_seeds: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> DataFrame:
    """Relative spam mass per vertex (see module docstring). ``rank`` and
    ``trust`` are the 8-rounded PageRank / TrustRank vectors; vertices with
    rank == 0 after rounding get rel_spam_mass 0.0 (no rank to attribute)."""
    pr = pagerank(
        spark,
        edges,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        fixed_iters=fixed_iters,
    ).ranks.select("vertex", F.round("rank", 8).alias("rank"))
    tr = trustrank(
        spark,
        edges,
        trusted_seeds,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        fixed_iters=fixed_iters,
    ).select("vertex", F.round("trust", 8).alias("trust"))
    return pr.join(tr, "vertex").select(
        "vertex",
        "rank",
        "trust",
        F.round(
            F.when(
                F.col("rank") > 0,
                (F.col("rank") - F.col("trust")) / F.col("rank"),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("rel_spam_mass"),
    )
