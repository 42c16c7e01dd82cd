"""Graph summary — the ONE call a user makes before anything else:
order, size, component structure, triangle density, and a diameter
bound, in a single one-row frame. Pure composition of already-scaled
kernels (cc.py, clustering.py, diameter.py) — this module adds no new
distributed machinery, just the deterministic glue (which component
seeds the diameter sweep, how ties break) so the whole row replays in
one composite SQL oracle (`graph_summary_tree_ring`, hash-exact).

Columns:
  n_vertices, n_edges          canonical undirected simple graph
  n_components                 CC count
  largest_size, largest_frac   largest component (ties → smallest
                               min-member label)
  n_triangles, n_wedges,       global transitivity = 3T/W (rounded 8,
  transitivity                 clustering.py contract)
  diameter_lb                  double-sweep lower bound seeded at the
                               LARGEST component's min member — the
                               component a user means when they ask
                               "how wide is my graph"

Cost: one CC fixpoint + one triangle join + two BFS fixpoints — each
individually bounded by its own operator's scale envelope; scalars only
on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class GraphSummaryResult:
    summary: DataFrame  # one row
    n_vertices: int
    n_edges: int
    n_components: int
    diameter_lb: int


def graph_summary(
    spark: SparkSession,
    edges: DataFrame,
    *,
    cc_method: str = "hashmin",
    with_diameter: bool = True,
) -> GraphSummaryResult:
    from .cc import connected_components
    from .clustering import transitivity
    from .diameter import diameter_double_sweep

    s = F.col("src").cast("long")
    d = F.col("dst").cast("long")
    und = (
        edges.select(F.least(s, d).alias("src"), F.greatest(s, d).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n_edges = und.count()
    schema = (
        "n_vertices long, n_edges long, n_components long,"
        " largest_size long, largest_frac double, n_triangles long,"
        " n_wedges long, transitivity double, diameter_lb long"
    )
    if n_edges == 0:
        empty = spark.createDataFrame(
            [(0, 0, 0, 0, 0.0, 0, 0, 0.0, 0)], schema
        )
        return GraphSummaryResult(empty, 0, 0, 0, 0)

    n_vertices = (
        und.select(F.col("src").alias("v"))
        .unionByName(und.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    comp = connected_components(spark, und, method=cc_method).components
    sizes = comp.groupBy("component").agg(F.count("*").alias("size"))
    n_components = sizes.count()
    big = (
        sizes.orderBy(F.col("size").desc(), F.col("component").asc())
        .limit(1)
        .collect()[0]
    )
    largest_size, largest_label = int(big["size"]), int(big["component"])

    trow = transitivity(spark, und).collect()[0]

    if with_diameter:
        ds = diameter_double_sweep(spark, und, start=largest_label)
        diameter_lb = ds.lower_bound
    else:
        diameter_lb = 0

    summary = spark.createDataFrame(
        [
            (
                n_vertices,
                n_edges,
                n_components,
                largest_size,
                largest_size / n_vertices,
                int(trow["n_triangles"]),
                int(trow["n_wedges"]),
                float(trow["transitivity"]),
                diameter_lb,
            )
        ],
        schema,
    )
    return GraphSummaryResult(summary, n_vertices, n_edges, n_components,
                              diameter_lb)
