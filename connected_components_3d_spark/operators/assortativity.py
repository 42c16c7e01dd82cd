"""Degree assortativity — Newman (2002) "Assortative mixing in networks":
the Pearson correlation of endpoint degrees over the edge list. Web link
graphs are famously DISassortative (hubs link to low-degree pages), so
this single scalar is a standard sanity/characterization statistic next
to the degree distribution (operators/degree.py).

Semantics match networkx ``degree_assortativity_coefficient`` on an
undirected simple graph: every undirected edge contributes BOTH ordered
orientations (x=deg u, y=deg v) and (x=deg v, y=deg u) to the sample, so
the correlation is symmetric by construction:

    r = (Σxy/M − (Σx/M)²) / (Σx²/M − (Σx/M)²),   M = 2·|E|

Distributed shape: one degree pass, two broadcast-or-shuffle joins to
annotate edge endpoints, then ONE aggregate folding the five sums — the
whole statistic is a single partial+final aggregation, no window, no
collect beyond the scalar row. Gate: plain-SQL DuckDB replay, hash-exact
(`assortativity_copart`, rounded 8dp); pytest: networkx parity on random
and handcrafted graphs.

Output: one row ``(r:double, n_edges:long)``; r is NULL on degree-regular
graphs (zero variance — networkx raises/NaNs there, SQL yields NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected


def degree_assortativity(spark: SparkSession, edges: DataFrame) -> DataFrame:
    und = canonical_undirected(edges)
    adj = und.selectExpr("src AS v", "dst AS nbr").unionAll(
        und.selectExpr("dst AS v", "src AS nbr")
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    # ordered sample: (deg v, deg nbr) for every orientation of every edge
    sample = (
        adj.join(deg, "v")
        .withColumnRenamed("deg", "x")
        .join(deg.selectExpr("v AS nbr", "deg AS y"), "nbr")
    )
    row = sample.agg(
        F.count("*").alias("m"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # symmetric sample ⇒ Σx = Σy and Σx² = Σy²; denominator zero on
    # degree-regular graphs → NULL (non-ANSI double division semantics)
    num = F.col("sxy") / F.col("m") - F.pow(F.col("sx") / F.col("m"), 2)
    den = F.col("sxx") / F.col("m") - F.pow(F.col("sx") / F.col("m"), 2)
    # try_divide: NULL (not an ANSI error) on degree-regular graphs
    return row.select(
        F.try_divide(num, den).alias("r"),
        (F.col("m") / F.lit(2)).cast("long").alias("n_edges"),
    )
