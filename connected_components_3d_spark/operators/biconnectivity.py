"""Articulation points and biconnected components (blocks) — the cut-VERTEX
structure of a web graph: which single hubs, if removed, disconnect a crawl
region, and the maximal 2-vertex-connected edge classes that the block-cut
tree is built from (the vertex analogue of operators/bridges.py).

Algorithm — tree-agnostic block construction over an arbitrary rooted
spanning forest (the Tarjan–Vishkin biconnectivity idea re-expressed
relationally, with BFS-tree + LCA machinery replacing the Euler tour):

  1. ROOT/LIFT/LCA: shared with bridges (operators/treelift.py) — a
     deterministic BFS forest, binary-lifting ancestor tables, and the LCA
     of every non-tree edge.
  2. CHILD SIDES: for a non-tree edge (x,y) with l = lca(x,y), bit-walk
     each endpoint up to depth(l)+1 — cx/cy are the children of l whose
     subtrees contain x/y (absent on a side whose endpoint IS l).
  3. ESCAPE SWEEP: mlca(x) = min depth(lca) over non-tree edges incident
     to x; a bottom-up min sweep gives submin(c) = min mlca over
     subtree(c). Child edge (c, parent(c)) "escapes" parent(c) iff
     submin(c) < depth(parent(c)) — some non-tree edge leaves subtree(c)
     and lands strictly outside subtree(parent(c)). LCA depth (not "level
     of far endpoint") is what makes this correct for BFS trees, where
     non-tree edges may be cross edges, not just back edges.
  4. BLOCK GRAPH: one node per NON-ROOT vertex c ≡ the tree edge
     (c, parent(c)). Edges: (cx, cy) for every non-tree edge with both
     child sides (their fundamental cycle passes through both tree edges
     at the shared LCA), and (c, parent(c)) whenever c escapes (the cycle
     continues through the grandparent edge). Two tree edges are in the
     same biconnected component iff connected here — blocks are the
     connected components of this vertex-sized graph (one reuse of the
     engine's CC kernel).
  5. EDGE LABELS: tree edge (c, parent(c)) → block(c); non-tree edge →
     block of either child side (both sides land in the same block by
     construction). Block ids are canonicalized to the lexicographically
     smallest member edge (bu, bv) — a tree-independent representative the
     DuckDB oracle reproduces without knowing the BFS tree.
  6. ARTICULATION POINTS: v is an articulation point iff ≥2 distinct
     blocks are incident to v (the block-cut-tree characterization);
     incidence over TREE edges alone suffices — every non-tree edge shares
     its block with a tree edge at each endpoint (its fundamental cycle
     enters each endpoint through one).

Semantics: simple undirected graph (canonicalized u<v, self-loops dropped,
parallel edges collapsed) — networkx.articulation_points /
networkx.biconnected_component_edges semantics. Isolated vertices belong
to no block and are never articulation points; a K2 component is a
one-edge block with no articulation points.

Scale shape: identical envelope to bridges — O(tree depth) rounds of
vertex-sized frontier/sweep joins plus O(log depth) rounds of lifting;
the block graph is vertex-sized (one node per non-root vertex, ≤1 edge
per non-tree edge + ≤1 per vertex), so step 4 is a CC run on a graph no
larger than the input. No Euler tour, no global list ranking, no
driver-side data collects (scalar probes only).

Gate: `articulation_mix` hash-compares the articulation set on the
tree+ring+chorded-fringe fixture against a brute-force DuckDB oracle
(per-VERTEX-removal min-label reachability — neighbors of v in distinct
components of G−v ⟺ articulation); `bicc_mix` hash-compares the per-edge
block labels against an independent SQL construction (edges adjacent at w
related iff far endpoints connected in G−w, transitive closure by
min-label over edge nodes). Pytest checks networkx parity on adversarial
shapes plus partition invariance.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc import connected_components
from .treelift import (
    _truncate,
    build_lifts,
    canonical_edges,
    lca_nontree,
    lift_to_depth,
    root_forest,
)

_INF = 1 << 62


@dataclass
class BiconnectivityResult:
    articulation_points: DataFrame  # (vertex:long)
    edge_blocks: DataFrame  # (u:long, v:long, bu:long, bv:long) — block rep edge
    num_articulation_points: int
    num_blocks: int
    tree_depth: int
    metrics: list[dict] = field(default_factory=list)


def biconnected(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_levels: int = 10_000,
) -> BiconnectivityResult:
    """Articulation points + biconnected-component (block) labels of the
    undirected simple graph induced by ``edges`` (src/dst, any orientation).

    ``edge_blocks`` carries one row per canonical edge with the block's
    canonical representative edge (bu, bv) = min lexicographic (u, v) member.
    """
    metrics: list[dict] = []
    t0 = time.time()
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = canonical_edges(edges).repartition(p, "u").persist()
    m = e.count()
    if m == 0:
        empty_a = spark.createDataFrame([], "vertex long")
        empty_b = spark.createDataFrame([], "u long, v long, bu long, bv long")
        return BiconnectivityResult(empty_a, empty_b, 0, 0, 0, metrics)

    # --- 1. shared rooting / lifting / LCA -------------------------------
    rf = root_forest(spark, e, p, max_levels=max_levels)
    state, dist, depth = rf.state, rf.dist, rf.depth
    metrics.append({"phase": "root", "depth": depth, "sec": time.time() - t0})
    up = build_lifts(state, depth, p)
    metrics.append({"phase": "lift", "levels": len(up), "sec": time.time() - t0})

    children = None  # (u, v, cu, cv) child-of-lca sides per non-tree edge
    mlca = None  # (vertex, mlca) min lca depth over incident non-tree edges
    if rf.n_nontree > 0:
        lca = lca_nontree(rf.nontree, dist, up, p)  # (u, v, lca, du, dv)
        dl = dist.select(
            F.col("vertex").alias("lca"), F.col("dist").alias("dl")
        )
        lca = _truncate(lca.join(dl, "lca").persist())
        lca.count()
        metrics.append(
            {"phase": "lca", "edges": rf.n_nontree, "sec": time.time() - t0}
        )

        # --- 2. child-of-lca on each side (bit-walk to depth dl+1) -------
        sides = (
            lca.where(F.col("du") > F.col("dl"))
            .select(
                "u",
                "v",
                F.lit("u").alias("side"),
                F.col("u").alias("node"),
                F.col("du").alias("nd"),
                (F.col("dl") + 1).alias("target"),
            )
            .unionByName(
                lca.where(F.col("dv") > F.col("dl")).select(
                    "u",
                    "v",
                    F.lit("v").alias("side"),
                    F.col("v").alias("node"),
                    F.col("dv").alias("nd"),
                    (F.col("dl") + 1).alias("target"),
                )
            )
        )
        sides = lift_to_depth(sides, up, p, "node", "nd", "target")
        children = (
            sides.groupBy("u", "v")
            .agg(
                F.min(F.when(F.col("side") == "u", F.col("node"))).alias("cu"),
                F.min(F.when(F.col("side") == "v", F.col("node"))).alias("cv"),
            )
            .persist()
        )

        # --- 3. escape sweep: mlca + bottom-up subtree min ----------------
        mlca = (
            lca.select(F.col("u").alias("vertex"), F.col("dl"))
            .unionByName(lca.select(F.col("v").alias("vertex"), F.col("dl")))
            .groupBy("vertex")
            .agg(F.min("dl").alias("mlca"))
        )

    acc = state.select("vertex", "parent", "depth")
    if mlca is not None:
        acc = acc.join(mlca, "vertex", "left").select(
            "vertex",
            "parent",
            "depth",
            F.coalesce("mlca", F.lit(_INF)).cast("long").alias("acc"),
        )
    else:
        acc = acc.select(
            "vertex", "parent", "depth", F.lit(_INF).cast("long").alias("acc")
        )
    acc = _truncate(acc.repartition(p, "vertex").persist())
    acc.count()
    for lvl in range(int(depth), 0, -1):
        contrib = (
            acc.where(F.col("depth") == lvl)
            .groupBy(F.col("parent").alias("vertex"))
            .agg(F.min("acc").alias("sub"))
        )
        acc = acc.join(contrib, "vertex", "left").select(
            "vertex",
            "parent",
            "depth",
            F.least(F.col("acc"), F.coalesce("sub", F.lit(_INF))).alias("acc"),
        )
        acc = _truncate(acc.repartition(p, "vertex").persist())
        acc.count()
    metrics.append({"phase": "sweep", "rounds": int(depth), "sec": time.time() - t0})

    # --- 4. block graph over non-root vertices (≡ tree edges) ------------
    # escape edges: (c, parent(c)) where subtree(c) reaches strictly above
    # parent(c); impossible when parent is a root (depth 0), so the parent
    # node always exists in the block graph.
    esc_edges = acc.where(
        (F.col("depth") > 0) & (F.col("acc") < F.col("depth") - 1)
    ).select(F.col("vertex").alias("src"), F.col("parent").alias("dst"))
    block_edges = esc_edges
    if children is not None:
        sib = children.where(
            F.col("cu").isNotNull() & F.col("cv").isNotNull()
        ).select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        block_edges = block_edges.unionByName(sib)

    nonroot = state.where(F.col("depth") > 0).select("vertex", "parent").persist()
    n_be = block_edges.count()
    if n_be > 0:
        blab = connected_components(spark, block_edges).components
        comp = nonroot.join(blab, "vertex", "left").select(
            "vertex",
            "parent",
            F.coalesce("component", F.col("vertex")).alias("blk"),
        )
    else:
        comp = nonroot.select(
            "vertex", "parent", F.col("vertex").alias("blk")
        )
    comp = _truncate(comp.repartition(p, "vertex").persist())
    comp.count()
    metrics.append({"phase": "blocks", "block_edges": n_be, "sec": time.time() - t0})

    # --- 5. per-edge block labels + canonical representatives ------------
    tree_blocks = comp.select(
        F.least("vertex", "parent").alias("u"),
        F.greatest("vertex", "parent").alias("v"),
        "blk",
    )
    eb = tree_blocks
    if children is not None:
        nt_blocks = (
            children.select(
                "u", "v", F.coalesce("cu", "cv").alias("cside")
            )
            .join(
                comp.select(F.col("vertex").alias("cside"), "blk"), "cside"
            )
            .select("u", "v", "blk")
        )
        eb = eb.unionByName(nt_blocks)
    rep = eb.groupBy("blk").agg(F.min(F.struct("u", "v")).alias("r"))
    edge_blocks = (
        eb.join(rep, "blk")
        .select("u", "v", F.col("r.u").alias("bu"), F.col("r.v").alias("bv"))
        .persist()
    )
    n_blocks = rep.count()

    # --- 6. articulation points: ≥2 distinct incident blocks -------------
    incid = tree_blocks.select(F.col("u").alias("vertex"), "blk").unionByName(
        tree_blocks.select(F.col("v").alias("vertex"), "blk")
    )
    artic = (
        incid.groupBy("vertex")
        .agg(F.countDistinct("blk").alias("nb"))
        .where(F.col("nb") >= 2)
        .select("vertex")
        .persist()
    )
    n_artic = artic.count()
    metrics.append(
        {
            "phase": "done",
            "articulation": n_artic,
            "blocks": n_blocks,
            "sec": time.time() - t0,
        }
    )
    return BiconnectivityResult(
        artic, edge_blocks, n_artic, n_blocks, int(depth), metrics
    )
