"""Degree-distribution analytics — the first thing anyone computes on a web
graph (Broder et al. 2000 report in/out-degree distributions before
anything else; power-law fit per Clauset–Shalizi–Newman 2009).

Two operators, both single-aggregation shapes that survive any scale:

  degree_distribution  log2-binned histogram of the chosen degree
      (bucket b covers 2^b ≤ deg < 2^(b+1); bucket −1 = degree-0 vertices,
      which exist whenever a vertex only appears on the other side of the
      edge relation). One degrees pass (two groupBys merged full-outer,
      operators/edges.py) + one bucket-keyed groupBy over the vertex-sized
      result — the bucket key space is ~64 values, and the partial
      aggregation collapses each partition to those 64 rows before the
      shuffle, so the exchange is O(partitions·64) rows regardless of V.

  powerlaw_alpha  discrete power-law exponent MLE (Clauset et al. eq. 3.7:
      α ≈ 1 + n·(Σ ln(d_i/(d_min − ½)))^{-1} over d_i ≥ d_min) + the n and
      d_min used. One filter + one two-value aggregate over the degree
      table; the estimate is exact given the cutoff (choosing d_min by KS
      minimization is a small driver-side loop over ~64 candidate cutoffs,
      deliberately NOT done here — pass d_min explicitly).

Both are hash-gated against plain-SQL DuckDB replays
(``degree_dist_bipartite``, ``powerlaw_alpha_bipartite``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .edges import degrees

_DEG_COL = {"out": "out_deg", "in": "in_deg", "total": "deg"}


def degree_distribution(
    spark: SparkSession,
    edges: DataFrame,
    *,
    direction: str = "total",
) -> DataFrame:
    """Log2-binned histogram of out/in/total degree over the DIRECTED
    simple graph (duplicate edges dropped by the degrees pass' input
    contract — pass a distinct edge table). Returns
    (bucket:long, min_deg:long, max_deg:long, n_vertices:long,
    frac:double) sorted by bucket; frac is of ALL vertices."""
    col = _DEG_COL[direction]
    deg = degrees(
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    ).select(F.col(col).cast("long").alias("d"))
    # bucket = floor(log2(d)) computed EXACTLY as binary length − 1:
    # float log2 can land at 2.9999… for d=8 and floor differently across
    # engines — the DuckDB oracle uses the same integer formulation
    hist = (
        deg.select(
            F.when(F.col("d") > 0, F.length(F.bin(F.col("d"))) - 1)
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("bucket"),
            "d",
        )
        .groupBy("bucket")
        .agg(
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
            F.count("*").alias("n_vertices"),
        )
    )
    total = F.sum("n_vertices").over(Window.partitionBy())
    # single-partition window over ≤64 histogram rows — not a data-sized
    # exchange (the heavy aggregation already happened)
    return (
        hist.select(
            "bucket",
            "min_deg",
            "max_deg",
            "n_vertices",
            F.round(F.col("n_vertices") / total, 8).alias("frac"),
        )
        .orderBy("bucket")
    )


def powerlaw_alpha(
    spark: SparkSession,
    edges: DataFrame,
    *,
    direction: str = "total",
    d_min: int = 2,
) -> DataFrame:
    """Discrete power-law exponent MLE over degrees ≥ ``d_min`` (Clauset–
    Shalizi–Newman 2009 eq. 3.7). One row: (d_min:long, n_tail:long,
    alpha:double); alpha is NULL-free — an empty tail returns n_tail=0 and
    alpha=0.0 rather than dividing by zero."""
    col = _DEG_COL[direction]
    deg = degrees(
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
    ).select(F.col(col).cast("long").alias("d"))
    tail = deg.where(F.col("d") >= d_min)
    agg = tail.agg(
        F.count("*").alias("n_tail"),
        F.sum(F.log(F.col("d") / (d_min - 0.5))).alias("_lsum"),
    )
    return agg.select(
        F.lit(int(d_min)).cast("long").alias("d_min"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.round(
            F.when(
                (F.col("n_tail") > 0) & (F.col("_lsum") > 0),
                1.0 + F.col("n_tail") / F.col("_lsum"),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("alpha"),
    )
