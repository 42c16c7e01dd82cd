"""Connected components over an explicit edge table (SURVEY.md O6).

Generalizes the reference's two-pass multilabel CCL kernel
[cc3d:`cc3d.hpp::connected_components` — UNVERIFIED; /root/reference empty,
SURVEY.md §0] to a distributed edge table. The distributed analogue of its
two passes:

  pass 1 (provisional labels + union-find)  →  block-local union-find over
      per-partition edge blocks inside ``applyInPandas`` (numpy
      Shiloach–Vishkin: vectorized hook + pointer-jump, no per-row Python);
  pass 2 (flatten + relabel)                →  hash-min label exchange on the
      contracted "star" graph to a global fixpoint, with pointer-jumping for
      O(log d) convergence, then labels ARE the relabeling (component id =
      min vertex id — canonical, deterministic, order-free; never `first()`).

Every superstep optionally checkpoints labels + metrics to an
Iceberg-style snapshot (sources/checkpoint.py) and the loop resumes from the
latest committed step [BASELINE.json:14].

Scale notes (100 TB / 10^12 pages):
- The driver-side loop issues one Spark job per superstep; the plan is
  truncated every step (checkpoint read-back or localCheckpoint), so lineage
  never grows across iterations (SURVEY.md §4.3.1).
- The block-UF contraction bounds the global loop's work by the number of
  *boundary* vertices (vertices seen by >1 partition) — on a web graph with
  locality-preserving ids the star graph is a small fraction of E.
- Hash-min + pointer-jumping converges in O(log diameter) supersteps on the
  contracted graph; min is decomposable so partial aggregation and salted
  hot keys (operators/skew.py) are safe.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..sources import checkpoint as ckpt
from .edges import vertices

_STAR_SCHEMA = StructType(
    [StructField("vertex", LongType()), StructField("root", LongType())]
)


@dataclass
class CCResult:
    components: DataFrame  # (vertex:long, component:long), component = min id
    num_supersteps: int
    metrics: list[dict] = field(default_factory=list)


# --------------------------------------------------------------------------
# block-local union-find (vectorized Shiloach–Vishkin in numpy)
# --------------------------------------------------------------------------


def _uf_fixpoint(parent: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Vectorized hook + full pointer-jump to fixpoint over an index-space
    parent array; ``u``/``v`` are edge endpoints as indices into ``parent``.
    O(log n) passes, no Python loop over edges. Mirrors the reference's
    union-find (path compression + union by min — min-id instead of size to
    make labels canonical). Shared by the edge-block contraction below and
    the dense slab grid kernel (operators/grid.py)."""
    while True:
        pu = parent[u]
        pv = parent[v]
        lo = np.minimum(pu, pv)
        hi = np.maximum(pu, pv)
        changed = bool((pu != pv).any())
        np.minimum.at(parent, hi, lo)
        # full shortcut: parent = parent[parent] to fixpoint
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if not changed:
            break
    return parent


def _local_cc_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vertex → min-id-of-local-component for one edge block."""
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    u = inv[: len(src)]
    v = inv[len(src) :]
    parent = _uf_fixpoint(np.arange(len(ids), dtype=np.int64), u, v)
    return ids, ids[parent]


def _block_uf(pdf: pd.DataFrame) -> pd.DataFrame:
    ids, roots = _local_cc_numpy(
        pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)
    )
    return pd.DataFrame({"vertex": ids, "root": roots})


def block_contract(
    edges_sym: DataFrame, num_blocks: int, block_key: str = "hash"
) -> DataFrame:
    """Per-partition union-find contraction → star edges (vertex, root).

    Each block's edge set is replaced by a star to the block-local min vertex;
    the union of stars has the same connected components as the input
    (each block's edges are replaced by a spanning structure of themselves).

    ``block_key`` picks the partitioner — correctness does not depend on the
    assignment (ANY split of the edges yields a valid contraction;
    partition-count invariance is property-tested), but the ROOT GRAPH SIZE
    AND DIAMETER do:

      "hash"   xxhash64(src) mod blocks — uniform load, no locality
               assumptions (web graphs with arbitrary ids);
      "range"  contiguous src-id ranges — when ids encode locality
               (Fortran-order grid voxels, crawl-ordered page ids) a block
               becomes a spatial slab that solves internally, so only
               slab-face vertices survive to the root graph and the global
               fixpoint diameter drops from O(lattice width) to O(blocks)
               (the distributed analogue of the reference's contiguous
               memory-order pass-1);
      "input"  NO repartition — each existing input partition is a block
               (VERDICT r2 #5): the zero-exchange path for edge tables
               already persisted bucketed-by-src (sources/tables.py
               save_bucketed), where the bucket layout gives the same
               src-locality as "hash" without paying the shuffle again.

    ``mapInPandas`` then drains each partition's Arrow batches into one numpy
    union-find — no groupBy-applyInPandas sort machinery on the E-row input.
    """

    def _drain(it):
        parts = list(it)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        if len(pdf):
            yield _block_uf(pdf)

    if block_key == "input":
        return edges_sym.mapInPandas(_drain, schema=_STAR_SCHEMA)
    if block_key == "range":
        rng = edges_sym.agg(
            F.min("src").alias("lo"), F.max("src").alias("hi")
        ).collect()[0]
        lo, hi = rng["lo"], rng["hi"]
        span = max((hi or 0) - (lo or 0) + 1, 1)
        width = -(-span // num_blocks)  # ceil
        part = ((F.col("src") - F.lit(lo)) / F.lit(width)).cast("int")
    elif block_key == "hash":
        part = F.pmod(F.xxhash64("src"), F.lit(num_blocks))
    else:
        raise ValueError(f"unknown block_key {block_key!r}")
    return (
        edges_sym.repartition(num_blocks, part)
        .mapInPandas(_drain, schema=_STAR_SCHEMA)
    )


# --------------------------------------------------------------------------
# global hash-min fixpoint with pointer jumping
# --------------------------------------------------------------------------


def _truncate(df: DataFrame) -> DataFrame:
    """Cut lineage so the iterative plan doesn't grow across supersteps."""
    return df.localCheckpoint(eager=True)


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    method: str = "blockuf",
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    checkpoint_format: str = "parquet",
    num_blocks: int | None = None,
    block_key: str = "hash",
    resume: bool = True,
    salting: bool | str = "auto",
    num_salts: int = 8,
    hot_key_threshold: int = 10_000_000,
    salting_min_edges: int = 10_000_000,
    # 8M rows ≈ 128MB torrent broadcast — comfortably inside executor memory
    # at any realistic sizing, and wide enough that a web graph's hub-label
    # plateau (hot-set size ~V/20) stays on the broadcast side rather than
    # oscillating across the gate with approx_count_distinct noise
    jump_broadcast_max_labels: int = 8_000_000,
    # frontier row count below which the neighbor-min switches to the
    # HALF-SCAN path: probe a persisted E-row single-orientation edge cache
    # with the (explicitly broadcast) frontier on BOTH endpoints and explode
    # the ≤2 candidates per edge — half the per-superstep cache-scan bytes
    # of the symmetric 2E table. DEFAULT OFF (0): an interleaved A/B at 40M
    # edges (scripts/probe_half_scan_ab.py, BENCH.md §2e) measured the
    # qualifying supersteps 1.5-2x SLOWER with the path on — the one-time
    # E-row cache build lands inside the first qualifying superstep and the
    # hash-min frontier decays so fast (1-2 sub-gate steps out of 8) that it
    # never amortizes, while the steady-state step is no faster at local[32].
    # Retained (exactness-pinned by test_half_scan_path_is_exact) for graphs
    # with a long small-frontier convergence tail, where many qualifying
    # steps would amortize the build.
    half_scan_max_frontier: int = 0,
) -> CCResult:
    """CC over a directed or undirected edge table.

    Returns ``components(vertex, component)`` with component = min vertex id
    of the equivalence class (cc3d parity is checked on equivalence classes
    under canonical relabeling [BASELINE.json:2]).

    method:
      "hashmin"  — pure hash-min + pointer jumping on the full edge set
                   (baseline / oracle path, SURVEY.md M2)
      "blockuf"  — block-local numpy union-find contraction first, then the
                   same loop on the contracted star graph (SURVEY.md M3)
    """
    if num_blocks is None:
        num_blocks = max(spark.sparkContext.defaultParallelism, 8)

    verts = vertices(edges)

    # int-packing: when every vertex id fits in int32, run the contraction
    # and the whole fixpoint on int columns — halves the persisted edge
    # cache, the Arrow transfer into the numpy block-UF, and every
    # per-superstep scan/shuffle byte (the memory-bandwidth-bound regime,
    # BENCH.md §2; attacks the 8→32 scaling wall). The range check is one
    # shuffle-free map-side min/max pass; it is a pure function of the data,
    # so resumed runs re-derive the same decision. Output is cast back to
    # long after the loop — the public (vertex, component) schema is fixed.
    # the same single pass also fingerprints the INPUT edge table (count +
    # bounded hash-sum — order/partitioning-free): recorded in every manifest
    # and REQUIRED to match on any resume, converged early-return included.
    # Labels live on a min-lattice (they only ever decrease), so composing a
    # snapshot with a drifted edge table can never undo merges from
    # since-removed edges — silently wrong, for both kernels (ADVICE r2
    # #1/#2). Computed pre-packing so the fingerprint is width-independent.
    rng = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))).alias("s"),
    ).collect()[0]
    edge_fp = f"{rng['n']}:{rng['s'] or 0}"
    packed = (
        rng["lo"] is not None
        and rng["lo"] >= -2147483648
        and rng["hi"] <= 2147483647
    )
    if packed:
        edges = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )

    metrics: list[dict] = []
    start_step = 0
    labels: DataFrame | None = None
    resume_root_fp: str | None = None
    # True when the loop starts from freshly-built identity labels (label ==
    # vertex for every row) rather than a resumed checkpoint — gates the
    # superstep-0 shortcut below
    identity_start = False

    if checkpoint_dir and resume:
        latest = ckpt.latest_valid_step(checkpoint_dir)
        if latest is not None:
            m = ckpt.read_manifest(checkpoint_dir, latest)
            recorded_efp = (m.get("params") or {}).get("edge_fp")
            if not ckpt.compatible_params(m, {"method": method}):
                # snapshot from a different kernel (e.g. blockuf labels keyed
                # by block roots resumed under hashmin): refuse silently-wrong
                # composition; start fresh
                latest = None
            elif recorded_efp is not None and recorded_efp != edge_fp:
                # the edge table drifted since the snapshot (covers the
                # converged early-return AND mid-run hashmin resume): the
                # stale steps can never become valid again — clear them so
                # the fresh run's converged snapshot is what future resumes
                # find (ADVICE r2 #1-#3)
                ckpt.clear_steps(checkpoint_dir)
                latest = None
            else:
                resume_root_fp = (m.get("params") or {}).get("root_fp")
                recorded_blocks = (m.get("params") or {}).get("num_blocks")
                recorded_bkey = (m.get("params") or {}).get("block_key")
                if method == "blockuf" and recorded_bkey is not None:
                    block_key = recorded_bkey
                if method == "blockuf" and recorded_blocks is not None:
                    # block roots only reproduce under the SAME contraction
                    # partitioning — pin it from the manifest, never from
                    # defaultParallelism (which varies across clusters)
                    num_blocks = recorded_blocks
                labels = ckpt.read_checkpoint(spark, checkpoint_dir, latest)
                if m["metrics"].get("converged"):
                    # packed runs snapshot int labels — restore the public
                    # long schema on the early-return path too
                    return CCResult(
                        labels.select(
                            F.col("vertex").cast("long").alias("vertex"),
                            F.col("label").cast("long").alias("component"),
                        ),
                        latest,
                        [m["metrics"]],
                    )
                start_step = latest + 1

    # shuffle-once layout (same rationale as pagerank.py): the propagation
    # edge table is hash-partitioned by src ONCE and persisted; the
    # per-superstep join then never re-exchanges the E-row side (persist —
    # not localCheckpoint — because LogicalRDD drops partitioning metadata)
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    vmin: DataFrame | None = None  # blockuf: vertex → min block-root
    if method == "blockuf":
        # TWO-LEVEL scheme (the reference's pass-1/pass-2 split,
        # distributed): the global fixpoint runs ONLY on the root graph —
        # the cross-block identifications — not on the full star set.
        #
        # The contraction eats FORWARD edges only (union-find is
        # direction-blind; symmetrizing doubles shuffle + Arrow traffic for
        # marginally better block locality). persist = columnar cache; the
        # consumers below scan the E-scale star rows twice.
        stars = block_contract(
            edges.select("src", "dst"), num_blocks, block_key
        ).persist()
        # vertex → all of its block-roots; edges (min-root ↔ other-root)
        # capture exactly the merges the blocks couldn't see. A vertex's
        # roots are mutually connected through it, so the root graph has the
        # same cross-block component structure as the full star union.
        vroots = stars.groupBy("vertex").agg(
            F.min("root").alias("r0"), F.collect_set("root").alias("roots")
        )
        vmin = _truncate(vroots.select("vertex", "r0"))
        root_edges = (
            vroots.select(
                F.col("r0").alias("src"), F.explode("roots").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        prop_edges = root_edges.unionByName(
            root_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        # root-graph fingerprint (ADVICE r1): mid-run blockuf labels are
        # keyed by block roots that only reproduce over the SAME input — a
        # resume against a drifted edge table would silently mis-compose
        # (the pass-2 coalesce masks missed joins). Fingerprint = (edge
        # count, bounded hash sum) of the recomputed root graph, recorded in
        # every manifest and compared on mid-run resume; mismatch restarts
        # from scratch. (The converged early-return is guarded by the
        # cheaper input-edge fingerprint above, which needs no contraction.)
        fp_row = root_edges.agg(
            F.count("*").alias("n"),
            F.sum(
                F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))
            ).alias("s"),
        ).collect()[0]
        root_fp = f"{fp_row['n']}:{fp_row['s'] or 0}"
        if start_step > 0 and resume_root_fp is not None and resume_root_fp != root_fp:
            labels = None
            start_step = 0
            if checkpoint_dir:
                # stale higher-numbered steps would shadow the fresh run's
                # converged snapshot in latest_valid_step (ADVICE r2 #3)
                ckpt.clear_steps(checkpoint_dir)
        if labels is None:
            # loop state lives on ROOT vertices only; canonical min-vertex
            # labels are preserved because the global minimum of a component
            # is necessarily a block-root (it is the minimum of its own
            # block-local component)
            roots_v = stars.select(F.col("root").alias("vertex")).distinct()
            labels = _truncate(
                roots_v.select("vertex", F.col("vertex").alias("label"))
            )
            identity_start = True
    elif method == "hashmin":
        # raw (non-distinct) symmetrization: duplicate edges cannot change a
        # min-aggregate, and the distinct() of the doubled edge table is the
        # single most expensive shuffle of the whole job (measured ~40% of CC
        # wall at 4M edges)
        prop_edges = edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        if labels is None:
            labels = _truncate(
                verts.select("vertex", F.col("vertex").alias("label"))
            )
            identity_start = True
    else:
        raise ValueError(f"unknown method {method!r}")

    _ckpt_params = {"method": method, "edge_fp": edge_fp}
    if method == "blockuf":
        _ckpt_params["num_blocks"] = num_blocks
        _ckpt_params["block_key"] = block_key
        _ckpt_params["root_fp"] = root_fp

    if packed:
        # the loop state follows the edge width: blockuf's stars/root graph
        # come back long from the numpy kernel, and resumed checkpoints may
        # be either width — normalize both sides to int (ids are in range:
        # loop vertices ⊆ edge endpoints)
        prop_edges = prop_edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
        labels = labels.select(
            F.col("vertex").cast("int").alias("vertex"),
            F.col("label").cast("int").alias("label"),
        )

    # sorted-cached layout: SMJ re-sorts only the label/frontier side each
    # superstep, never the E-row edge side (see pagerank.py)
    prop_edges = prop_edges.repartition(p, "src").sortWithinPartitions("src").persist()
    if method == "blockuf":
        prop_edges.count()  # materialize the root graph, then drop the stars
        stars.unpersist()

    n_edges = prop_edges.count()

    # O13 hot-key mitigation (north rule: explicit skew handling). Map-side
    # partial aggregation already bounds what a hub dst RECEIVES at the
    # reducer (≤ one partial min per map partition); the salted two-stage
    # path additionally bounds what any single map-side hash-agg task holds
    # when one partition's edge block is dominated by a 10^8-in-link hub.
    # min is decomposable → labels are bit-identical with salting on or off
    # (property-tested). Detection is ONE extra groupBy(dst).count pass, paid
    # only above ``salting_min_edges`` (≈ one superstep's scan, amortized
    # over the O(log d) loop).
    if salting == "auto":
        if n_edges >= salting_min_edges:
            max_indeg = (
                prop_edges.groupBy("dst")
                .agg(F.count("*").alias("c"))
                .agg(F.max("c").alias("m"))
                .collect()[0]["m"]
            )
            use_salting = (max_indeg or 0) > hot_key_threshold
        else:
            use_salting = False
    else:
        use_salting = bool(salting)

    step = start_step
    converged = False
    # frontier-based propagation: labels only ever DECREASE (min-lattice), so
    # a new minimum can only enter a vertex through a neighbor whose label
    # just dropped — propagating only the changed ("frontier") labels is
    # exact, and as the frontier shrinks AQE flips the edges⋈frontier join to
    # a broadcast, turning late supersteps into map-side joins. On resume the
    # frontier is unknown → one full-width step re-establishes it.
    frontier = labels  # (vertex, label)
    half_edges: DataFrame | None = None  # lazily-built E-row half cache
    n_labels = labels.count()
    prev_changed: int | None = None
    # running estimate of DISTINCT label values (refreshed each superstep in
    # the same action that counts the frontier — no extra pass): gates the
    # broadcast jump map below
    prev_distinct: int | None = None
    jump_skip_allowed = True
    for step in range(start_step, max_iter):
        t0 = time.time()
        # (1) neighbor-min along edges OUT OF THE FRONTIER only (labels live
        # on a min-lattice: a new minimum can only arrive from a neighbor
        # whose label just dropped, so the E-row join shrinks with the
        # frontier and AQE broadcasts it once it is small)
        # superstep-0 identity shortcut: on a fresh run labels == frontier ==
        # identity, so label(src) IS src — the E⋈V join is the identity on
        # the edge side and the pointer-jump map is a no-op. The widest
        # superstep of the job (full frontier) collapses to ONE
        # map-side-combined min aggregation over the persisted edge table.
        # Bit-identical labels: min(src over in-neighbors) ≡ min(label(src))
        # under identity. Hub-safe without salting: partial aggregation
        # bounds what any reducer receives (≤ one partial per map partition)
        # and no join output materializes hub-width rows.
        first_identity = identity_start and step == 0
        # HALF-SCAN gate (opt-in, see half_scan_max_frontier above): once the
        # frontier fits a broadcast, candidates come from ONE scan of the
        # E-row single-orientation cache (two broadcast hash probes +
        # explode) instead of the symmetric 2E table — exactly the same
        # candidate multiset, half the streamed cache bytes. Built lazily
        # from the
        # already-persisted symmetric cache (src<dst recovers one orientation
        # for both kernels: root_edges is min-root-first by construction;
        # hashmin's canonical subset keeps every edge once per input
        # occurrence — duplicates can't change a min). prop_edges stays
        # persisted: a frontier is not guaranteed monotone-small, and the
        # wide/salted/resume steps still need the SMJ layout.
        use_half = (
            not first_identity
            and not use_salting
            and prev_changed is not None
            and prev_changed <= half_scan_max_frontier
        )
        if use_half and half_edges is None:
            half_edges = (
                prop_edges.where(F.col("src") < F.col("dst")).persist()
            )
            half_edges.count()
        if first_identity:
            nbr_min = prop_edges.groupBy(F.col("dst").alias("vertex")).agg(
                F.min("src").alias("nbr_label")
            )
        elif use_half:
            fa = frontier.select(
                F.col("vertex").alias("_fav"), F.col("label").alias("_fal")
            )
            fb = frontier.select(
                F.col("vertex").alias("_fbv"), F.col("label").alias("_fbl")
            )
            nbr_min = (
                half_edges.join(
                    F.broadcast(fa), F.col("src") == F.col("_fav"), "left"
                )
                .join(F.broadcast(fb), F.col("dst") == F.col("_fbv"), "left")
                .where(
                    F.col("_fal").isNotNull() | F.col("_fbl").isNotNull()
                )
                .select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("dst").alias("v"),
                                F.col("_fal").alias("lab"),
                            ),
                            F.struct(
                                F.col("src").alias("v"),
                                F.col("_fbl").alias("lab"),
                            ),
                        )
                    ).alias("c")
                )
                .where(F.col("c.lab").isNotNull())
                .groupBy(F.col("c.v").alias("vertex"))
                .agg(F.min("c.lab").alias("nbr_label"))
            )
        elif use_salting:
            from .skew import salted_min_join

            nbr_min = salted_min_join(frontier, prop_edges, num_salts)
        else:
            nbr_min = (
                prop_edges.join(frontier, prop_edges.src == frontier.vertex)
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.min("label").alias("nbr_label"))
            )
        stepped = labels.join(nbr_min, "vertex", "left").select(
            "vertex",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "mid_label"
            ),
        )
        # (2) FULL pointer jump label ← label(label) over all vertices — the
        # doubling that makes high-diameter chains converge in O(log d)
        # supersteps (the labels map is total: every label value is a vertex
        # id in `labels`). The jump is a V⋈V self-join that re-shuffles BOTH
        # 10M-row sides every superstep — once the frontier has collapsed
        # below 0.5% of V it is pure overhead on low-diameter web graphs
        # (measured ~half the wall of a near-converged superstep at 40M
        # edges), and neighbor-min alone is exact, so it is skipped. BUT a
        # tiny frontier can also mean a chain regime (grid/lattice graphs:
        # a small wave crawling a long path) where skipping turns O(log d)
        # into O(d) — so a stall detector below permanently re-enables the
        # jump the moment a skipped superstep fails to at least halve the
        # frontier. Worst case: ONE extra cheap superstep.
        # (first_identity: the jump map is the identity — skipping it is
        # exact and saves the V⋈V self-join on the widest superstep. The
        # stall detector is unaffected: prev_changed is None at step 0.)
        do_jump = not first_identity and not (
            jump_skip_allowed
            and prev_changed is not None
            and prev_changed < max(int(0.005 * n_labels), 32)
        )
        if do_jump:
            # CONVERGENCE-SKEW guard (the 160M-edge scale-killer, BENCH.md
            # §2): the jump keys `stepped` by mid_label, and as labels
            # collapse toward component minima the giant component's min id
            # becomes a maximally hot key — a plain V⋈V SMJ funnels nearly
            # all V rows into ONE reduce task (measured: 17-task stage with
            # a single 200s straggler while 31 cores idle). But the jump map
            # only needs DISTINCT label values — a set that shrinks
            # monotonically as CC converges — so once it fits a broadcast,
            # contract the map (distinct labels ⋈ labels: skew-free, one
            # output row per key) and broadcast-hash-join it into `stepped`:
            # no exchange by mid_label at all, no straggler, and two V-row
            # shuffles removed per superstep. Bit-identical labels either
            # way (mid_label is always a current label value, so the
            # contracted map is total over it).
            #
            # ABOVE the broadcast cap the fallback must STILL be skew-safe:
            # a plain V-row map SMJ re-creates the straggler whenever the
            # distinct-label estimate sits near the cap (measured at 160M
            # edges / 2M-hub graph: the estimate oscillated across the 2M
            # gate superstep to superstep, and every SMJ superstep cost
            # 136-158s vs 48s broadcast — same 37M-row frontier). So the
            # fallback joins the CONTRACTED map too, replicated across
            # num_salts sub-keys with the probe side salted by vertex hash:
            # a hot mid_label's V rows spread over num_salts reduce tasks
            # instead of one. Bit-identical (pure replicated lookup).
            dvals = labels.select(F.col("label").alias("j_vertex")).distinct()
            small = (
                prev_distinct is not None
                and prev_distinct <= jump_broadcast_max_labels
            )
            # IDENTITY FILTER (round 3, found via the 2-core cluster pair,
            # BENCH.md §2c): a map entry with label(L) == L is a no-op under
            # the left-join + coalesce(mid_label) below, so only
            # NON-CONVERGED label values need to ship. The distinct-label
            # set shrinks slowly on a hub-heavy graph (the 2M-hub plateau),
            # but the non-identity subset collapses with the frontier —
            # this turns the per-superstep broadcast from
            # O(distinct labels) (~128MB at the 8M gate) into O(labels
            # still moving), cutting the per-executor fetch+build cost that
            # multiplies with executor count. Bit-identical labels either
            # branch (missing key ⇒ coalesce keeps mid_label ⇒ exactly the
            # identity the dropped entry encoded).
            cmap = (
                labels.join(
                    F.broadcast(dvals) if small else dvals,
                    labels.vertex == dvals.j_vertex,
                )
                .where(F.col("vertex") != F.col("label"))
                .select("j_vertex", F.col("label").alias("j_label"))
            )
            if small:
                jump = F.broadcast(cmap)
                probe = stepped
                cond = probe.mid_label == jump.j_vertex
            else:
                jump = cmap.withColumn(
                    "_jsalt",
                    F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
                )
                probe = stepped.withColumn(
                    "_psalt",
                    F.pmod(F.xxhash64("vertex"), F.lit(num_salts)).cast("int"),
                )
                cond = (probe.mid_label == jump.j_vertex) & (
                    probe._psalt == jump._jsalt
                )
            new_labels = _truncate(
                probe.join(jump, cond, "left").select(
                    "vertex",
                    "old_label",
                    F.least(
                        F.col("mid_label"), F.coalesce("j_label", F.col("mid_label"))
                    ).alias("label"),
                )
            )
        else:
            new_labels = _truncate(
                stepped.select(
                    "vertex", "old_label", F.col("mid_label").alias("label")
                )
            )
        # frontier for the next superstep = vertices whose label changed via
        # EITHER the neighbor-min or the jump
        frontier = new_labels.where(F.col("label") != F.col("old_label")).select(
            "vertex", "label"
        )
        # ONE action per superstep: frontier size + distinct-label estimate
        # (feeds the broadcast-jump gate next superstep; ±5% rsd is plenty
        # for a threshold decision)
        _row = new_labels.agg(
            F.count(
                F.when(F.col("label") != F.col("old_label"), F.lit(1))
            ).alias("chg"),
            F.approx_count_distinct("label").alias("nd"),
        ).collect()[0]
        changed = _row["chg"]
        prev_distinct = _row["nd"]
        if (
            not do_jump
            and prev_changed is not None
            and changed >= max(prev_changed // 2, 1)
        ):
            # the skipped-jump superstep did not at least halve the frontier
            # → chain regime, doubling is load-bearing here
            jump_skip_allowed = False
        prev_changed = changed
        labels = new_labels.select("vertex", "label")
        gc.collect()  # drop py4j refs to superseded checkpoint RDDs promptly
        wall = time.time() - t0
        converged = changed == 0
        m = {
            "superstep": step,
            "labels_changed": changed,
            "edges_active": n_edges,
            "wall_s": round(wall, 4),
            "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            "method": method,
            "converged": converged,
        }
        metrics.append(m)
        if checkpoint_dir and (step % checkpoint_every == 0 or converged):
            # blockuf NEVER commits converged=True from inside the loop: the
            # labels here cover ROOT vertices only, and a crash between this
            # write and the post-loop composition would make resume return
            # root labels as final components (dropping every non-root
            # vertex). The composed converged snapshot is written after
            # composition below; hashmin labels are already full-vertex.
            if not (converged and method == "blockuf"):
                ckpt.write_checkpoint(
                    labels, checkpoint_dir, step, m,
                    params=_ckpt_params, table_format=checkpoint_format,
                )
                # re-read for plan truncation; frontier stays the (already
                # materialized) changed set — resetting it to the full label
                # table would make every checkpointed step full-width
                labels = ckpt.read_checkpoint(spark, checkpoint_dir, step)
        if converged:
            break
    if not converged:
        raise RuntimeError(f"CC did not converge within {max_iter} supersteps")
    prop_edges.unpersist()
    if half_edges is not None:
        half_edges.unpersist()
    if packed:
        labels = labels.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col("label").cast("long").alias("label"),
        )

    if method == "blockuf" and vmin is not None:
        # pass-2 composition: every vertex adopts its (min) block-root's
        # converged label. All roots of one vertex share a component, so any
        # root's label is the component label.
        labels = _truncate(
            vmin.join(
                labels.withColumnRenamed("vertex", "r0"), "r0", "left"
            ).select(
                "vertex", F.coalesce("label", F.col("r0")).alias("label")
            )
        )
        if checkpoint_dir:
            # the converged snapshot must hold the COMPOSED labels so a
            # resume's early return yields full components, not root labels
            # (the loop above skipped its converged write for blockuf — this
            # is the ONLY converged=True commit on this path)
            ckpt.write_checkpoint(
                labels, checkpoint_dir, step, metrics[-1],
                params=_ckpt_params, table_format=checkpoint_format,
            )

    # compose back onto the full vertex set (blockuf labels cover exactly the
    # vertices of the original edges since every vertex appears in ≥1 block)
    components = verts.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("label", F.col("vertex")).alias("component")
    )
    return CCResult(components, step + 1, metrics)


def components_from_stars(
    spark: SparkSession,
    stars: DataFrame,
    *,
    max_iter: int = 200,
    single_block_edges: int = 20_000_000,
) -> DataFrame:
    """Global pass-2 over a pre-contracted star set ``(vertex, root)``.

    Input contract: each row asserts vertex ∼ root, every vertex of the graph
    appears at least once, and the union of stars has the same connected
    components as the original graph (any per-block contraction satisfies
    this — operators/grid.py's dense slab kernel produces exactly this
    shape). The global work runs ONLY on the cross-block root graph — the
    identifications no single block could see — then every vertex adopts its
    min-root's converged label. Returns ``(vertex, component)`` materialized
    (localCheckpoint), with component = min vertex id of the class (roots
    are min-gids of their local components, so the global min of a component
    is always a root and min-label canonicality is preserved).

    The root graph is bounded by BOUNDARY vertices (those seen by >1 block),
    typically orders of magnitude below V. Below ``single_block_edges`` it is
    solved in ONE numpy union-find task (block_contract with one block) —
    no per-superstep job overhead; above, the O(log d) hash-min fixpoint
    takes over. The star pipeline is persisted so the expensive pass-1
    kernel executes exactly once across all downstream actions.

    Fast path: if ``stars`` carries boolean ``owner``/``face`` columns —
    producers that KNOW which vertices can appear with multiple roots tag
    each row (grid.py's dense slab kernel: ``face`` = halo-plane vertex,
    duplicated across slabs; ``owner`` = the single authoritative row per
    vertex) — then the per-vertex aggregation runs ONLY on face rows (a few
    % of V) and the converged labels join back by broadcast, so the O(V)
    interior rows are never shuffled again after the kernel's own
    repartition. Multi-executor grid scaling was bound on exactly that
    redundant O(V) groupBy (BENCH.md §2)."""
    if {"owner", "face"}.issubset(set(stars.columns)):
        return _components_from_tagged_stars(
            spark,
            stars,
            max_iter=max_iter,
            single_block_edges=single_block_edges,
        )
    vroots = (
        stars.groupBy("vertex")
        .agg(F.min("root").alias("r0"), F.collect_set("root").alias("roots"))
        .persist()
    )
    root_edges = (
        vroots.select(F.col("r0").alias("src"), F.explode("roots").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_root_edges = root_edges.count()  # scans the cached vroots only
    vmin = vroots.select("vertex", "r0")
    if n_root_edges == 0:
        out = _truncate(vmin.select("vertex", F.col("r0").alias("component")))
        vroots.unpersist()
        return out
    if n_root_edges <= single_block_edges:
        labels = block_contract(root_edges, 1, "hash").select(
            F.col("vertex").alias("r0"), F.col("root").alias("component")
        )
    else:
        labels = (
            connected_components(
                spark, root_edges, method="hashmin", max_iter=max_iter
            )
            .components.withColumnRenamed("vertex", "r0")
        )
    out = _truncate(
        vmin.join(labels, "r0", "left").select(
            "vertex", F.coalesce("component", F.col("r0")).alias("component")
        )
    )
    vroots.unpersist()
    return out


def _components_from_tagged_stars(
    spark: SparkSession,
    stars: DataFrame,
    *,
    max_iter: int,
    single_block_edges: int,
    broadcast_labels_max: int = 2_000_000,
) -> DataFrame:
    """Tagged-stars stitch (see components_from_stars docstring).

    Correctness: a vertex can contribute a root edge only if it has ≥2
    distinct roots, which requires appearing in ≥2 blocks — exactly the rows
    the producer tagged ``face`` — so the face-only aggregation builds the
    SAME root-edge set as the untagged full groupBy. All roots of one
    vertex land in one union-find class, so joining the converged labels on
    the owner row's root (not the per-vertex min root) yields the same
    component; roots never seen by the fixpoint keep themselves (coalesce).
    """
    stars = stars.persist()
    vroots = (
        stars.where("face")
        .groupBy("vertex")
        .agg(F.min("root").alias("r0"), F.collect_set("root").alias("roots"))
    )
    root_edges = (
        vroots.select(F.col("r0").alias("src"), F.explode("roots").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_root_edges = root_edges.count()  # also materializes the persisted stars
    owner = stars.where("owner").select("vertex", "root")
    if n_root_edges == 0:
        out = _truncate(owner.select("vertex", F.col("root").alias("component")))
        stars.unpersist()
        return out
    if n_root_edges <= single_block_edges:
        labels = block_contract(root_edges, 1, "hash").select(
            F.col("vertex").alias("root"), F.col("root").alias("component")
        )
    else:
        labels = (
            connected_components(spark, root_edges, method="hashmin", max_iter=max_iter)
            .components.select(F.col("vertex").alias("root"), "component")
        )
    if n_root_edges <= broadcast_labels_max:
        labels = F.broadcast(labels)
    out = _truncate(
        owner.join(labels, "root", "left").select(
            "vertex", F.coalesce("component", F.col("root")).alias("component")
        )
    )
    stars.unpersist()
    return out


def num_components(components: DataFrame) -> int:
    """Reference's ``return_N`` (R3)."""
    return components.select(F.countDistinct("component")).collect()[0][0]
