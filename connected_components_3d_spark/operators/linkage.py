"""Single-linkage hierarchical clustering at scale — the dendrogram cut
every near-duplicate / embedding-similarity pipeline eventually wants
("merge anything closer than t", or "give me k clusters"), computed
EXACTLY from the minimum spanning forest instead of any sequential
agglomeration:

  single-linkage fact (Gower–Ross 1969): cutting every MSF edge with
  weight > t yields exactly the connected components of the ≤t-threshold
  graph — the single-linkage clusters at height t. For a k-cut, drop the
  k−1 heaviest forest edges (under the same (weight, u, v) total order
  that makes the MSF unique, operators/msf.py) within each tree.

So the operator is a composition of two already-scaled kernels:
Borůvka MSF (log-round, operators/msf.py) + one CC run
(operators/cc.py) over the CUT forest — V−1 edges at most, i.e. the CC
input is vertex-sized regardless of how dense the similarity graph was.
No sequential dendrogram, no priority queue, no driver-side loop over
merges.

Threshold cut (`height=t`) is a filter; k-cut ranks forest edges by
(weight DESC, u ASC, v ASC) globally — the forest is vertex-sized and
the rank stops at k−1, a TOP-(k−1) anti-join, not a global sort
materialization.

Gate: `linkage_tree_ring` cuts the weighted tree∪ring fixture at a
fixed height and hash-compares (vertex, cluster) against a Kruskal MSF
+ min-label-closure DuckDB replay (`_linkage_sql`). Isolated vertices
(no edge ≤ t) are their own singleton clusters via the left join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class LinkageResult:
    clusters: DataFrame  # (vertex:long, cluster:long) — min-member label
    cut_edges: int  # forest edges removed by the cut
    num_clusters: int


def single_linkage(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str = "weight",
    height: int | None = None,
    k: int | None = None,
    cc_method: str = "hashmin",
) -> LinkageResult:
    """Single-linkage clusters of the undirected weighted graph: cut the
    unique MSF at ``height`` (keep forest edges with weight ≤ height) or
    into ``k`` clusters per spanning tree surplus (drop the k−1 heaviest
    forest edges globally). Exactly one of height/k must be given.

    Every vertex of ``edges`` appears in the output; vertices whose
    forest edges were all cut become singletons labeled by themselves.
    Cluster label = min member vertex id."""
    from .cc import connected_components
    from .msf import minimum_spanning_forest

    if (height is None) == (k is None):
        raise ValueError("pass exactly one of height= or k=")
    if k is not None and k < 1:
        raise ValueError("k must be >= 1")

    msf = minimum_spanning_forest(spark, edges, weight_col=weight_col)
    forest = msf.forest  # (u, v, weight), u < v, vertex-sized

    if height is not None:
        kept = forest.where(F.col("weight") <= height)
    else:
        ranked = forest.orderBy(
            F.col("weight").desc(), F.col("u").asc(), F.col("v").asc()
        ).limit(k - 1)
        kept = forest.join(ranked, ["u", "v", "weight"], "left_anti")

    comp = connected_components(
        spark,
        kept.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        method=cc_method,
    ).components

    verts = (
        edges.select(F.col("src").cast("long").alias("vertex"))
        .unionByName(edges.select(F.col("dst").cast("long").alias("vertex")))
        .distinct()
    )
    clusters = (
        verts.join(
            comp.withColumnRenamed("component", "cluster"), "vertex", "left"
        )
        .select(
            "vertex", F.coalesce("cluster", F.col("vertex")).alias("cluster")
        )
        .persist()
    )
    n_kept = kept.count()
    cut_edges = msf.num_edges - n_kept
    num_clusters = clusters.select("cluster").distinct().count()
    return LinkageResult(clusters, cut_edges, num_clusters)
