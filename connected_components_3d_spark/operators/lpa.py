"""Label propagation (semi-synchronous, deterministic ties) — SURVEY.md O8.

Per iteration every vertex adopts the most frequent label among its
neighbors; ties break to the SMALLEST label (deterministic — the whole
update is order-free, so results are identical under any partitioning;
Catalyst must never pick `first()`-style nondeterminism, SURVEY.md §4.3.5).
Isolated vertices keep their label. Synchronous LPA can 2-cycle on bipartite
structures, so convergence is "no change OR max_iter"; the parity oracle runs
a single-node implementation with the SAME rule for the SAME iteration count
(exact match [BASELINE.json:6]).
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import symmetrize, vertices


@dataclass
class LPAResult:
    labels: DataFrame  # (vertex:long, label:long)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    initial_labels: DataFrame | None = None,
    max_iter: int = 20,
    fixed_iters: int | None = None,
    salting: bool | str = "auto",
    num_salts: int = 8,
    hot_key_threshold: int = 10_000_000,
    salting_min_edges: int = 10_000_000,
) -> LPAResult:
    """LPA over the undirected view of ``edges``.

    ``initial_labels(vertex, label)`` defaults to label = vertex id.
    ``fixed_iters`` runs exactly k sync updates (oracle-parity mode).
    """
    # int-packing (see cc.py): half-width keys for the cached edge table and
    # every per-iteration histogram shuffle when ids fit int32
    rng = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
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
        if initial_labels is not None:
            # initial labels are arbitrary longs; only pack when they fit too
            lrng = initial_labels.agg(
                F.min("label").alias("lo"), F.max("label").alias("hi")
            ).collect()[0]
            if lrng["lo"] is not None and not (
                lrng["lo"] >= -2147483648 and lrng["hi"] <= 2147483647
            ):
                packed = False
                edges = edges.select(
                    F.col("src").cast("long").alias("src"),
                    F.col("dst").cast("long").alias("dst"),
                )
            elif lrng["lo"] is not None:
                initial_labels = initial_labels.select(
                    F.col("vertex").cast("int").alias("vertex"),
                    F.col("label").cast("int").alias("label"),
                )
    # sorted-cached edge layout (see pagerank.py): the per-iteration
    # histogram join re-sorts only the labels side, never the edge side
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Self-loop convention: (v,v) edges are DROPPED after symmetrize, so a
    # vertex never counts its own label in its neighbor histogram and a
    # self-loop-only vertex is not in the vertex set — the same convention
    # lpa_single_node (the parity oracle) applies with its u==v skip.
    e = (
        symmetrize(edges)
        .where(F.col("src") != F.col("dst"))
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    verts = vertices(e)
    if initial_labels is None:
        labels = verts.select("vertex", F.col("vertex").alias("label"))
    else:
        labels = verts.join(initial_labels, "vertex", "left").select(
            "vertex", F.coalesce("label", F.col("vertex")).alias("label")
        )
    labels = _truncate(labels)

    n_edges = e.count()

    # O13 hot-key treatment for the histogram count (same detector as cc.py;
    # count decomposes as partial count + final sum, so results are exact)
    if salting == "auto":
        if n_edges >= salting_min_edges:
            max_indeg = (
                e.groupBy("dst")
                .agg(F.count("*").alias("c"))
                .agg(F.max("c").alias("m"))
                .collect()[0]["m"]
            )
            use_salting = (max_indeg or 0) > hot_key_threshold
        else:
            use_salting = False
    else:
        use_salting = bool(salting)

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    it = 0
    for it in range(iters):
        t0 = time.time()
        # neighbor label histogram: for edge (src,dst), dst sees src's label
        joined = e.join(labels.withColumnRenamed("vertex", "src"), "src")
        if use_salting:
            partial = (
                joined.select(
                    F.col("dst"),
                    F.col("label").alias("nbr_label"),
                    F.pmod(F.xxhash64(e.src), F.lit(num_salts))
                    .cast("int")
                    .alias("_salt"),
                )
                .groupBy("dst", "nbr_label", "_salt")
                .agg(F.count("*").alias("_c"))
            )
            nbr = partial.groupBy(
                F.col("dst").alias("vertex"), "nbr_label"
            ).agg(F.sum("_c").alias("cnt"))
        else:
            nbr = (
                joined.groupBy(
                    F.col("dst").alias("vertex"),
                    F.col("label").alias("nbr_label"),
                )
                .agg(F.count("*").alias("cnt"))
            )
        # per-vertex argmax via min_by over (-cnt, label): partial-
        # aggregatable (no per-vertex sort, no window) and hub-safe — a
        # 10^8-distinct-label hub never materializes one sorted partition.
        # Ties break to the SMALLEST label by the lexicographic struct order.
        best = nbr.groupBy("vertex").agg(
            F.min_by(
                "nbr_label", F.struct((-F.col("cnt")).alias("nc"), "nbr_label")
            ).alias("new_label")
        )
        new_labels = labels.join(best, "vertex", "left").select(
            "vertex",
            F.col("label").alias("old_label"),
            F.coalesce("new_label", F.col("label")).alias("label"),
        )
        new_labels = _truncate(new_labels)
        changed = new_labels.where(F.col("label") != F.col("old_label")).count()
        labels = new_labels.select("vertex", "label")
        gc.collect()  # drop py4j refs to superseded checkpoint RDDs promptly
        wall = time.time() - t0
        metrics.append(
            {
                "iter": it,
                "labels_changed": changed,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if fixed_iters is None and changed == 0:
            converged = True
            break
    if fixed_iters is not None:
        converged = True
    e.unpersist()  # labels are localCheckpoint-materialized
    if packed:
        labels = labels.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col("label").cast("long").alias("label"),
        )
    return LPAResult(labels, it + 1, converged, metrics)


def lpa_single_node(
    edges: list[tuple[int, int]],
    initial: dict[int, int] | None = None,
    iters: int = 10,
) -> dict[int, int]:
    """Single-node reference LPA with the SAME tie rule (test oracle,
    FIXTURES.md §4 g_lpa)."""
    from collections import Counter, defaultdict

    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    verts = sorted(adj.keys())
    labels = {v: (initial.get(v, v) if initial else v) for v in verts}
    for _ in range(iters):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in adj[v])
            best_cnt = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best_cnt)
        if new == labels:
            break
        labels = new
    return labels


def label_propagation_checkpointed(
    spark: SparkSession,
    edges: DataFrame,
    *,
    checkpoint_dir: str,
    fixed_iters: int,
    checkpoint_every: int = 1,
    resume: bool = True,
    checkpoint_format: str = "parquet",
    **kw,
) -> LPAResult:
    """Durable checkpoint/resume for LPA — the O7g wrapper pattern
    (operators/pagerank.py ``pagerank_checkpointed``) on the label table.
    Synchronous LPA is a deterministic map on its state (labels ↦ next
    labels, given the edge table), so running ``fixed_iters`` in
    ``checkpoint_every``-sized chunks warm-started via ``initial_labels``
    is BIT-identical to one uninterrupted run — chunked durability is
    free. Manifests record the input-edge fingerprint (count + order-free
    bounded hash-sum); a drifted edge table or a snapshot past the target
    clears the steps and restarts cold (labels from another graph must
    never seed this one). Fixed-iteration contract only."""
    from ..sources import checkpoint as ckpt

    assert fixed_iters >= 1 and checkpoint_every >= 1
    rng = edges.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))
        ).alias("s"),
    ).collect()[0]
    params = {"kernel": "lpa", "edge_fp": f"{rng['n']}:{rng['s'] or 0}"}
    done = 0
    labels: DataFrame | None = None
    if resume:
        latest = ckpt.latest_valid_step(checkpoint_dir)
        if latest is not None:
            m = ckpt.read_manifest(checkpoint_dir, latest)
            if ckpt.compatible_params(m, params) and latest <= fixed_iters:
                done = latest
                labels = ckpt.read_checkpoint(spark, checkpoint_dir, latest)
            else:
                ckpt.clear_steps(checkpoint_dir)
    metrics: list[dict] = []
    while done < fixed_iters:
        k = min(checkpoint_every, fixed_iters - done)
        res = label_propagation(
            spark, edges, fixed_iters=k, initial_labels=labels, **kw
        )
        done += k
        ckpt.write_checkpoint(
            res.labels,
            checkpoint_dir,
            done,
            metrics={"iters_done": done, "chunk_iters": k},
            params=params,
            table_format=checkpoint_format,
        )
        labels = ckpt.read_checkpoint(spark, checkpoint_dir, done)
        metrics.extend(res.metrics)
    if labels is None:
        labels = ckpt.read_checkpoint(spark, checkpoint_dir, fixed_iters)
    return LPAResult(labels, fixed_iters, True, metrics)
