"""Community quality metrics over an explicit vertex→community assignment
(the output of LPA, CC, or any clustering): Newman–Girvan modularity and
per-community conductance — the two standard "was this partition any
good" statistics.

For the undirected simple graph with m edges, community c with d_c = sum
of member degrees, e_c = internal edges, cut_c = boundary edges:

    modularity contribution  q_c = e_c/m − (d_c / 2m)²     (Q = Σ_c q_c)
    conductance              φ_c = cut_c / min(d_c, 2m − d_c)

Distributed shape: annotate each edge's endpoints with their communities
(two joins against the V-row assignment), then ONE groupBy(community)
folding internal/boundary counts, plus a degree-sum groupBy — all
partial+final aggregations on community keys (high-cardinality by
construction for real partitions; a pathological giant community is one
row, not one partition). The scalar Q is the sum of a community-sized
table — never collected per-vertex.

Vertices missing from ``assignment`` form implicit singleton communities
of their own vertex id (matches LPA/CC outputs, which always cover V).

Gate: plain-SQL DuckDB replay over the LPA-labeled tree graph, hash-exact
(`modularity_tree`); pytest: networkx ``modularity`` parity plus
hand-checked conductance on cut-known graphs.

Output: ``(community:long, n_vertices:long, internal_edges:long,
degree_sum:long, cut_edges:long, contribution:double,
conductance:double)`` — conductance NULL for a community spanning the
whole graph (min(d_c, 2m−d_c) = 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected, vertices


def community_metrics(
    spark: SparkSession, edges: DataFrame, assignment: DataFrame
) -> DataFrame:
    """``assignment``: (vertex, community). Returns per-community metrics;
    ``Q = sum(contribution)``."""
    und = canonical_undirected(edges).persist()
    verts = vertices(und)
    asg = (
        verts.join(
            assignment.select(
                F.col("vertex").cast("long").alias("vertex"),
                F.col("community").cast("long").alias("community"),
            ),
            "vertex",
            "left",
        )
        .select(
            "vertex", F.coalesce("community", "vertex").alias("community")
        )
    )
    tagged = (
        und.join(asg.selectExpr("vertex AS src", "community AS c_src"), "src")
        .join(asg.selectExpr("vertex AS dst", "community AS c_dst"), "dst")
        .persist()
    )
    m_row = und.agg(F.count("*").alias("m")).collect()[0]
    m = m_row["m"]
    internal = (
        tagged.where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.count("*").alias("internal_edges"))
    )
    # each boundary edge contributes one cut to BOTH endpoint communities
    cut = (
        tagged.where(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("community"))
        .unionAll(
            tagged.where(F.col("c_src") != F.col("c_dst")).select(
                F.col("c_dst").alias("community")
            )
        )
        .groupBy("community")
        .agg(F.count("*").alias("cut_edges"))
    )
    # degree sum + size per community: degrees from the symmetric pass
    adj = und.selectExpr("src AS v", "dst AS nbr").unionAll(
        und.selectExpr("dst AS v", "src AS nbr")
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    base = (
        asg.join(deg.withColumnRenamed("v", "vertex"), "vertex", "left")
        .groupBy("community")
        .agg(
            F.count("*").alias("n_vertices"),
            F.sum(F.coalesce("deg", F.lit(0))).alias("degree_sum"),
        )
    )
    out = (
        base.join(internal, "community", "left")
        .join(cut, "community", "left")
        .select(
            F.col("community").cast("long").alias("community"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.coalesce("internal_edges", F.lit(0))
            .cast("long")
            .alias("internal_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
            (
                F.try_divide(
                    F.coalesce("internal_edges", F.lit(0)), F.lit(float(m))
                )
                - F.pow(
                    F.try_divide(F.col("degree_sum"), F.lit(2.0 * m)), 2
                )
            ).alias("contribution"),
            F.try_divide(
                F.coalesce("cut_edges", F.lit(0)),
                F.least(
                    F.col("degree_sum"), F.lit(2 * m) - F.col("degree_sum")
                ),
            ).alias("conductance"),
        )
    )
    out = out.localCheckpoint(eager=True)
    tagged.unpersist()
    und.unpersist()
    return out


def modularity(spark: SparkSession, edges: DataFrame, assignment: DataFrame) -> float:
    """Scalar Newman–Girvan Q (driver-side sum of the community table)."""
    row = (
        community_metrics(spark, edges, assignment)
        .agg(F.sum("contribution").alias("q"))
        .collect()[0]
    )
    return float(row["q"] or 0.0)
