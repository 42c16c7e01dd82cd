"""Graph condensation: contract vertices by an explicit vertex→component
assignment (SCC / CC / LPA / community output) into the quotient graph —
for SCC assignments this is the classic condensation DAG (networkx
``condensation``), the scaffold for reachability/topology analyses over a
web graph's bowtie.

Scale shape: two assignment joins annotate each edge's endpoints with their
components (E-sized shuffles — irreducible for a general V-sized
assignment; when the assignment fits the broadcast threshold Catalyst/AQE
picks broadcast joins and no edge bytes move), then one (src_comp,
dst_comp)-keyed groupBy with partial aggregation — quotient-sized output.
No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def condense(
    edges: DataFrame,
    assignment: DataFrame,
    *,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Quotient graph of ``edges`` (src, dst) under ``assignment``
    (vertex, component).

    Returns (src_comp, dst_comp, n_edges:long) — one row per quotient edge
    with the count of underlying edges (multiplicity). ``drop_self_loops``
    removes intra-component edges (the condensation-DAG convention; SCC
    assignments then yield an acyclic quotient by construction). Edges
    whose endpoint is missing from the assignment are dropped — the inner
    join makes the contract explicit rather than inventing a component.
    """
    a_src = assignment.select(
        F.col("vertex").alias("_cv_s"), F.col("component").alias("src_comp")
    )
    a_dst = assignment.select(
        F.col("vertex").alias("_cv_d"), F.col("component").alias("dst_comp")
    )
    g = (
        edges.join(a_src, edges.src == F.col("_cv_s"))
        .join(a_dst, edges.dst == F.col("_cv_d"))
        .select("src_comp", "dst_comp")
    )
    if drop_self_loops:
        g = g.where(F.col("src_comp") != F.col("dst_comp"))
    return g.groupBy("src_comp", "dst_comp").agg(
        F.count("*").alias("n_edges")
    )
