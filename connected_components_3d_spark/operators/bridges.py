"""Bridges and 2-edge-connected components — the cut-edge structure of a
web graph (which single links, if dropped, disconnect a crawl region; the
2ECC quotient is the "robust core" decomposition used in link-spam and
site-structure analysis).

Algorithm (tree-agnostic cycle-cover, the PRAM-era standard re-expressed
relationally — Tarjan–Vishkin's observation that a spanning-tree edge is a
bridge iff NO non-tree edge "covers" it, i.e. iff no non-tree edge's
endpoints straddle it; valid for ANY spanning tree, not just DFS trees):

  1. ROOT: connected components (min-label) give one root per component;
     multi-source BFS from the roots yields (vertex, dist, root); the BFS
     tree's parent(v) = MIN neighbor at dist(v)−1 — deterministic, so the
     whole construction (and hence every intermediate) is replayable.
     (operators/treelift.py `root_forest` — shared with biconnectivity.)
  2. LIFT: binary-lifting ancestor tables up_k(v) = 2^k-th ancestor,
     k ≤ ⌈log₂ depth⌉, built by k successive vertex-sized self-joins
     (up_{k+1} = up_k ∘ up_k, root clamped to itself). (`build_lifts`.)
  3. LCA: for every NON-tree edge (u,v), equalize depths then descend —
     the textbook simultaneous-lifting loop run data-parallel over an
     edge-sized state table, one up_k join per round, 2·⌈log₂ d⌉ rounds.
     (`lca_nontree`.)
  4. COVER COUNTS: each non-tree edge contributes +1 at u, +1 at v, −2 at
     lca(u,v); the subtree sum at w then counts EXACTLY the non-tree edges
     with one endpoint under w and one outside — i.e. the edges covering
     the tree edge (w, parent(w)). (Both-endpoints-inside contributes
     +1+1−2 = 0; fully outside 0; straddling +1.)
  5. SWEEP: subtree sums by one bottom-up level sweep (children's
     accumulators fold into parents, deepest level first) — depth rounds
     of child-sized groupBy + vertex-sized join, the same round envelope
     as the BFS that built the tree.
  6. Bridge ⟺ tree edge (w, parent(w)) with subtree sum 0. Non-tree edges
     are never bridges (each closes a cycle by construction).
  7. 2ECC labels = connected components of G minus its bridges (every
     vertex keeps a label; isolated-after-removal vertices are their own
     singleton class). An edge is a bridge iff its endpoints land in
     different 2ECC classes — the pytest cross-check.

Semantics: simple undirected graph — input rows are canonicalized
(u < v), deduplicated, self-loops dropped (networkx.Graph semantics; a
parallel edge in the raw input does NOT make its endpoints 2-edge-
connected here, exactly as networkx.bridges sees it).

Scale shape: everything is joins over vertex- or edge-sized tables; the
only per-round loops are (a) the BFS rooting and the bottom-up sweep —
O(tree depth) rounds, the engine's standard frontier envelope
(operators/bfs.py, operators/cc.py hash-min), with BFS trees giving the
SHALLOWEST possible spanning tree per root, and (b) the lifting/LCA
loops — O(log depth) rounds. No Euler tour / global list ranking is
needed (that would demand a global prefix sum); cover counting replaces
it with pure key-joins. Lineage is truncated per round (localCheckpoint,
the cc.py superstep discipline). Driver actions are scalar-only (depth
probe, per-round counts).

Gate: `bridges_mix` hash-compares the bridge set on the tree+ring fixture
against a brute-force DuckDB oracle (per-edge reachability in G−e via a
recursive CTE — an INDEPENDENT O(E·V) replay of this O(log)-round
kernel); `two_ecc_mix` hash-compares the 2ECC labels against min-label
reachability over G minus the oracle's own bridge set. Pytest checks
networkx.bridges / 2ECC parity on adversarial small graphs plus partition
invariance.
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
    root_forest,
)


@dataclass
class BridgesResult:
    bridges: DataFrame  # (u:long, v:long), u < v — the cut edges
    two_edge_components: DataFrame  # (vertex:long, component:long)
    num_bridges: int
    tree_depth: int
    metrics: list[dict] = field(default_factory=list)


def bridges(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_levels: int = 10_000,
) -> BridgesResult:
    """All bridges + 2-edge-connected-component labels of the undirected
    simple graph induced by ``edges`` (src/dst columns, any orientation).
    """
    metrics: list[dict] = []
    t0 = time.time()
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = canonical_edges(edges).repartition(p, "u").persist()
    m = e.count()
    if m == 0:
        empty_b = spark.createDataFrame([], "u long, v long")
        empty_c = spark.createDataFrame([], "vertex long, component long")
        return BridgesResult(empty_b, empty_c, 0, 0, metrics)

    # --- 1. ROOT: components → roots → BFS tree -------------------------
    rf = root_forest(spark, e, p, max_levels=max_levels)
    state, dist, depth = rf.state, rf.dist, rf.depth
    metrics.append({"phase": "root", "depth": depth, "sec": time.time() - t0})

    # --- 2. LIFT: binary ancestor tables --------------------------------
    up = build_lifts(state, depth, p)
    metrics.append({"phase": "lift", "levels": len(up), "sec": time.time() - t0})

    cnt = None
    if rf.n_nontree > 0:
        # --- 3. LCA over the non-tree edges ------------------------------
        lca = lca_nontree(rf.nontree, dist, up, p).select("u", "v", "lca")
        metrics.append(
            {"phase": "lca", "edges": rf.n_nontree, "sec": time.time() - t0}
        )

        # --- 4. cover counts ---------------------------------------------
        cnt = (
            lca.select(F.col("u").alias("vertex"), F.lit(1).alias("c"))
            .unionByName(lca.select(F.col("v").alias("vertex"), F.lit(1).alias("c")))
            .unionByName(
                lca.select(F.col("lca").alias("vertex"), F.lit(-2).alias("c"))
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )

    # --- 5. bottom-up sweep: subtree sums --------------------------------
    acc = state.select("vertex", "parent", "depth")
    if cnt is not None:
        acc = acc.join(cnt, "vertex", "left")
        acc = acc.select(
            "vertex",
            "parent",
            "depth",
            F.coalesce("c", F.lit(0)).cast("long").alias("acc"),
        )
    else:
        acc = acc.select(
            "vertex", "parent", "depth", F.lit(0).cast("long").alias("acc")
        )
    acc = _truncate(acc.repartition(p, "vertex").persist())
    acc.count()
    for lvl in range(int(depth), 0, -1):
        contrib = (
            acc.where(F.col("depth") == lvl)
            .groupBy(F.col("parent").alias("vertex"))
            .agg(F.sum("acc").alias("add"))
        )
        acc = acc.join(contrib, "vertex", "left").select(
            "vertex",
            "parent",
            "depth",
            (F.col("acc") + F.coalesce("add", F.lit(0))).alias("acc"),
        )
        acc = _truncate(acc.repartition(p, "vertex").persist())
        acc.count()
    metrics.append({"phase": "sweep", "rounds": int(depth), "sec": time.time() - t0})

    # --- 6. bridges -------------------------------------------------------
    bri = (
        acc.where((F.col("depth") > 0) & (F.col("acc") == 0))
        .select(
            F.least("vertex", "parent").alias("u"),
            F.greatest("vertex", "parent").alias("v"),
        )
        .persist()
    )
    nb = bri.count()

    # --- 7. 2ECC labels -----------------------------------------------------
    keep = e.join(bri, ["u", "v"], "left_anti")
    verts = dist.select("vertex")
    if nb == m:  # every edge a bridge → all singletons
        twoecc = verts.select("vertex", F.col("vertex").alias("component"))
    else:
        lab = connected_components(
            spark, keep.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        ).components
        twoecc = verts.join(lab, "vertex", "left").select(
            "vertex",
            F.coalesce("component", F.col("vertex")).alias("component"),
        )
    metrics.append({"phase": "done", "bridges": nb, "sec": time.time() - t0})
    return BridgesResult(bri, twoecc, nb, int(depth), metrics)
