"""Link reciprocity: how much of a page's out-linking is returned.

Classic web-graph statistic (directed-graph reciprocity): for each vertex
with at least one out-edge, the fraction of its out-edges (v, u) whose
reverse (u, v) also exists. Pure relational shape — one canonical self-join
on the simple edge table plus a per-source aggregation; Catalyst handles
partial aggregation and AQE handles the join strategy, so the operator is a
single shuffle pair at any scale.

Output: ``(vertex:long, out_deg:long, recip_deg:long, reciprocity:double)``
— reciprocity rounded to 8 places so the driver hash is reassociation-proof
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def reciprocity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex reciprocity over the DIRECTED simple graph (duplicate
    edges and self-loops dropped; vertices with no out-edge are omitted —
    reciprocity is undefined for them)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(rev, ["src", "dst"], "left_semi").select(
        "src", F.lit(1).alias("_recip")
    )
    recip = marked.groupBy("src").agg(F.count("*").alias("recip_deg"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    return (
        deg.join(recip, "src", "left")
        .select(
            F.col("src").alias("vertex"),
            "out_deg",
            F.coalesce("recip_deg", F.lit(0)).cast("long").alias("recip_deg"),
            F.round(
                F.coalesce("recip_deg", F.lit(0)) / F.col("out_deg"), 8
            ).alias("reciprocity"),
        )
    )
