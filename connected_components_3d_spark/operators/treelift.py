"""Shared rooted-spanning-forest machinery: deterministic BFS rooting,
binary-lifting ancestor tables, data-parallel LCA, and lift-to-depth bit
walks — the common substrate of operators/bridges.py (cover-count bridges /
2ECC) and operators/biconnectivity.py (articulation points / biconnected
components).

Everything here is joins over vertex- or edge-sized tables. The only
per-round loops are the BFS rooting (O(tree depth) rounds — the engine's
standard frontier envelope, and BFS trees are the SHALLOWEST spanning tree
per root) and the lifting/LCA/bit-walk loops (O(log depth) rounds). No
Euler tour / global list ranking anywhere. Lineage is truncated per round
(localCheckpoint, the cc.py superstep discipline); driver actions are
scalar-only (depth probe, per-round counts).

Determinism: the BFS parent is the MIN neighbor one level closer to the
root, and roots are the min-label component representatives — so the whole
forest (and every structure derived from it) is replayable and partition-
invariant, which is what lets the DuckDB gate oracles hash-compare outputs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc import connected_components


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def canonical_edges(edges: DataFrame) -> DataFrame:
    """(u<v) canonical simple-graph edge set (networkx.Graph semantics:
    self-loops dropped, parallel edges collapsed, orientation erased)."""
    s = F.col("src").cast("long")
    d = F.col("dst").cast("long")
    return (
        edges.select(F.least(s, d).alias("u"), F.greatest(s, d).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


@dataclass
class RootedForest:
    state: DataFrame  # (vertex:long, parent:long, depth:long) — roots self-parented
    dist: DataFrame  # (vertex:long, dist:long) — every vertex reached
    depth: int  # max depth over the forest
    tree: DataFrame  # canonical (u,v) tree edges
    nontree: DataFrame  # canonical (u,v) non-tree edges
    n_nontree: int


def root_forest(
    spark: SparkSession,
    e: DataFrame,
    p: int,
    *,
    max_levels: int = 10_000,
) -> RootedForest:
    """Deterministic BFS spanning forest of the canonical edge set ``e``:
    min-label components give one root per component, multi-source BFS
    gives depths, parent(v) = MIN neighbor at dist(v)-1."""
    sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    cc = connected_components(
        spark, e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    ).components
    roots = cc.select(F.col("component").alias("vertex")).distinct()

    from .bfs import bfs_distances

    bfs = bfs_distances(
        spark,
        e.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        roots,
        direction="both",
        max_levels=max_levels,
    )
    dist = bfs.distances.select("vertex", "dist").persist()
    depth = dist.agg(F.max("dist")).collect()[0][0] or 0

    nbr = sym.join(
        dist.withColumnRenamed("vertex", "src").withColumnRenamed("dist", "sdist"),
        "src",
    )
    nbr = nbr.join(
        dist.withColumnRenamed("vertex", "dst").withColumnRenamed("dist", "ddist"),
        "dst",
    )
    parent = (
        nbr.where(F.col("sdist") == F.col("ddist") + 1)
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.min("dst").alias("parent"))
    )
    state = (
        dist.join(parent, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("parent", F.col("vertex")).alias("parent"),
            F.col("dist").alias("depth"),
        )
        .repartition(p, "vertex")
    )
    state = _truncate(state.persist())
    state.count()

    tree = (
        state.where(F.col("depth") > 0)
        .select(
            F.least("vertex", "parent").alias("u"),
            F.greatest("vertex", "parent").alias("v"),
        )
        .persist()
    )
    nontree = e.join(tree, ["u", "v"], "left_anti").persist()
    n_nontree = nontree.count()
    return RootedForest(state, dist, int(depth), tree, nontree, n_nontree)


def build_lifts(state: DataFrame, depth: int, p: int) -> list[DataFrame]:
    """Binary-lifting ancestor tables up[k](v) = 2^k-th ancestor (root
    clamped to itself), built by K successive vertex-sized self-joins.
    Every level stays resident; each is vertex-sized."""
    K = max(1, math.ceil(math.log2(max(depth, 1) + 1)))
    up: list[DataFrame] = []
    up0 = state.select("vertex", F.col("parent").alias("anc"))
    up0 = _truncate(up0.repartition(p, "vertex").persist())
    up0.count()
    up.append(up0)
    for _k in range(1, K + 1):
        prev = up[-1]
        nxt = (
            prev.alias("a")
            .join(
                prev.select(
                    F.col("vertex").alias("anc"), F.col("anc").alias("anc2")
                ).alias("b"),
                "anc",
            )
            .select("vertex", F.col("anc2").alias("anc"))
        )
        nxt = _truncate(nxt.repartition(p, "vertex").persist())
        nxt.count()
        up.append(nxt)
    return up


def lca_nontree(
    nontree: DataFrame, dist: DataFrame, up: list[DataFrame], p: int
) -> DataFrame:
    """LCA for every non-tree edge: equalize depths then descend — the
    textbook simultaneous-lifting loop run data-parallel over an edge-sized
    state table, one up_k join per round, 2·(K+1) rounds.

    Returns (u, v, lca, du, dv) with du/dv the original endpoint depths.
    """
    K = len(up) - 1
    du = dist.withColumnRenamed("vertex", "u").withColumnRenamed("dist", "du")
    dv = dist.withColumnRenamed("vertex", "v").withColumnRenamed("dist", "dv")
    st = (
        nontree.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("u").alias("au"),
            F.col("v").alias("av"),
            "du",
            "dv",
            F.col("du").alias("du0"),
            F.col("dv").alias("dv0"),
        )
    )
    # equalize depths: lift the deeper side by 2^k whenever the depth
    # difference admits it (standard big-to-small bit walk)
    for k in range(K, -1, -1):
        step = 1 << k
        uk = up[k]
        st = (
            st.join(
                uk.select(F.col("vertex").alias("au"), F.col("anc").alias("jau")),
                "au",
                "left",
            )
            .join(
                uk.select(F.col("vertex").alias("av"), F.col("anc").alias("jav")),
                "av",
                "left",
            )
            .select(
                "u",
                "v",
                F.when(F.col("du") - F.col("dv") >= step, F.col("jau"))
                .otherwise(F.col("au"))
                .alias("au"),
                F.when(F.col("dv") - F.col("du") >= step, F.col("jav"))
                .otherwise(F.col("av"))
                .alias("av"),
                F.when(F.col("du") - F.col("dv") >= step, F.col("du") - step)
                .otherwise(F.col("du"))
                .alias("du"),
                F.when(F.col("dv") - F.col("du") >= step, F.col("dv") - step)
                .otherwise(F.col("dv"))
                .alias("dv"),
                "du0",
                "dv0",
            )
        )
        st = _truncate(st.repartition(p, "au").persist())
        st.count()
    # descend: jump both sides while their 2^k ancestors differ
    for k in range(K, -1, -1):
        uk = up[k]
        st = (
            st.join(
                uk.select(F.col("vertex").alias("au"), F.col("anc").alias("jau")),
                "au",
                "left",
            )
            .join(
                uk.select(F.col("vertex").alias("av"), F.col("anc").alias("jav")),
                "av",
                "left",
            )
            .select(
                "u",
                "v",
                F.when(
                    (F.col("au") != F.col("av")) & (F.col("jau") != F.col("jav")),
                    F.col("jau"),
                )
                .otherwise(F.col("au"))
                .alias("au"),
                F.when(
                    (F.col("au") != F.col("av")) & (F.col("jau") != F.col("jav")),
                    F.col("jav"),
                )
                .otherwise(F.col("av"))
                .alias("av"),
                "du",
                "dv",
                "du0",
                "dv0",
            )
        )
        st = _truncate(st.repartition(p, "au").persist())
        st.count()
    return (
        st.join(
            up[0].select(F.col("vertex").alias("au"), F.col("anc").alias("pau")),
            "au",
            "left",
        )
        .select(
            "u",
            "v",
            F.when(F.col("au") == F.col("av"), F.col("au"))
            .otherwise(F.col("pau"))
            .alias("lca"),
            F.col("du0").alias("du"),
            F.col("dv0").alias("dv"),
        )
    )


def lift_to_depth(
    st: DataFrame,
    up: list[DataFrame],
    p: int,
    node_col: str,
    depth_col: str,
    target_col: str,
) -> DataFrame:
    """Bit-walk ``node_col`` up the tree until ``depth_col`` == ``target_col``
    (assumes depth ≥ target on every row; rows already at target pass
    through untouched). K+1 rounds of vertex-table joins."""
    K = len(up) - 1
    for k in range(K, -1, -1):
        step = 1 << k
        uk = up[k]
        others = [c for c in st.columns if c not in (node_col, depth_col)]
        st = (
            st.join(
                uk.select(
                    F.col("vertex").alias(node_col), F.col("anc").alias("__j")
                ),
                node_col,
                "left",
            )
            .select(
                *others,
                F.when(F.col(depth_col) - F.col(target_col) >= step, F.col("__j"))
                .otherwise(F.col(node_col))
                .alias(node_col),
                F.when(
                    F.col(depth_col) - F.col(target_col) >= step,
                    F.col(depth_col) - step,
                )
                .otherwise(F.col(depth_col))
                .alias(depth_col),
            )
        )
        st = _truncate(st.repartition(p, node_col).persist())
        st.count()
    return st
