"""Clustering coefficients (local + global) over the undirected simple
graph — the standard "how clique-like is each page's neighborhood" web-graph
statistic (Watts–Strogatz local coefficient; Newman transitivity).

Pure composition of already-gated primitives: per-vertex triangle counts
ride the degree-oriented triangle enumeration (operators/triangles.py —
wedge fan-out bounded by arboricity, hub-safe at web scale), degrees are one
groupBy over the canonical undirected edge table. The only additional work
on top of the triangle pass is a vertex-sized join + one vertex-sized
aggregation, so the cost envelope at 100 TB is the triangle pass itself.

Outputs:
  local_clustering  (vertex:long, deg:long, n_tri:long, lcc:double)
      lcc = 2·n_tri / (deg·(deg−1)), 0.0 when deg < 2; rounded to 8 places
      so the driver hash is reassociation-proof vs the DuckDB oracle
      (driver gate row ``clustering_copart``).
  transitivity      one row (n_triangles, n_wedges, transitivity)
      transitivity = 3·#triangles / #wedges (#wedges = Σ_v C(deg_v, 2));
      0.0 on a wedge-free graph (networkx convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected
from .triangles import triangles_per_vertex


def _und_degrees(edges: DataFrame) -> DataFrame:
    und = canonical_undirected(edges)
    return (
        und.select(F.col("src").alias("vertex"))
        .unionAll(und.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("deg"))
    )


def local_clustering(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient (networkx ``clustering``
    parity on the undirected simple graph; directed input is symmetrized
    by the canonical-undirected projection, self-loops dropped)."""
    deg = _und_degrees(edges)
    tri = triangles_per_vertex(edges)
    return deg.join(tri, "vertex", "left").select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("deg").cast("long").alias("deg"),
        F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("lcc"),
    )


def transitivity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Global transitivity = 3·triangles / wedges (networkx parity), one
    row: (n_triangles:long, n_wedges:long, transitivity:double)."""
    deg = _und_degrees(edges)
    tri = triangles_per_vertex(edges)
    # Σ_v n_tri(v) = 3·#triangles (each triangle is incident to 3 vertices)
    agg = (
        deg.join(tri, "vertex", "left")
        .agg(
            (
                F.coalesce(F.sum("n_tri"), F.lit(0)).cast("long") / 3
            ).cast("long").alias("n_triangles"),
            F.coalesce(
                F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0)
            ).cast("long").alias("n_wedges"),
        )
    )
    return agg.select(
        "n_triangles",
        "n_wedges",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("transitivity"),
    )
