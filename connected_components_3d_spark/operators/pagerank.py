"""PageRank: power iteration with dangling-mass redistribution (SURVEY.md O7).

Matches networkx's ``pagerank`` semantics exactly (float64 throughout):
  x0 = 1/N;  per iteration
  danglesum = alpha * Σ x_last[dangling]
  x[v] = alpha * Σ_{u→v} x_last[u]/outdeg(u)  +  danglesum/N  +  (1-alpha)/N
  stop when Σ|x - x_last| < N * tol   (networkx's L1 criterion)

Parity gate: allclose 1e-6 vs networkx at convergence [BASELINE.json:6].

Spark shape per iteration: one join (ranks ⋈ edges, shuffle on src — edges
are pre-partitioned once and reused every iteration) + one groupBy(dst).sum
(partial+final agg) + a broadcast of two scalars (danglesum, err). The
dangling-mass scalar and the L1 error are computed in the SAME pass over the
new ranks (single action per superstep, SURVEY.md §4.3.4).
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vertex:long, rank:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    salting: bool | str = "auto",
    num_salts: int = 8,
    hot_key_threshold: int = 10_000_000,
    salting_min_edges: int = 10_000_000,
    pre_partitioned: bool = False,
    assume_distinct: bool = False,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """PageRank on the DIRECTED edge table (duplicate edges are dropped —
    simple-graph semantics, matching a networkx DiGraph built from the same
    pairs). ``fixed_iters`` disables the convergence test (used for the
    SQL-oracle parity path where duckdb runs the same k chained iterations).

    ``pre_partitioned`` / ``assume_distinct`` (VERDICT r2 #5): for an edge
    table already persisted bucketed-by-src and de-duplicated
    (sources/tables.py save_bucketed), skip the one-time repartition+sort
    and/or the distinct — the kernel then reads the bucket layout with ZERO
    edge-side exchanges, ever (the bucket count should match
    spark.sql.shuffle.partitions so the per-iteration SMJ lines up without
    re-exchanging either side). Both flags are caller promises; wrong
    promises cost correctness (duplicate contributions) or an extra runtime
    exchange, so they default off. ``pre_partitioned`` disables int-packing
    (the cast re-projects src, erasing the relation's known partitioning) —
    store the bucketed table at int width to get both.

    ``init_ranks`` (vertex, rank) warm-starts the iteration instead of the
    uniform vector — the incremental-recrawl path: after an edge-batch
    update, restart from yesterday's ranks and converge in a handful of
    iterations instead of ~50. Vertices absent from ``init_ranks`` start
    at 1/n; the initial dangling mass is Σ rank over dangling vertices
    (for the uniform start the legacy count/n formula is kept
    bit-for-bit). Because one PR step is AFFINE (r' = αAr + b), k warm
    iterations from a j-iteration vector equal j+k cold iterations on the
    SAME graph — the `pagerank_warm_bipartite` gate row pins exactly
    that (3 cold + 2 warm ≡ the 5-iteration chained-CTE oracle).
    """
    # shuffle-once layout: the edge table is hash-partitioned by src a single
    # time and persisted; every iteration's contribs join then lines up with
    # the vertex-partitioned ranks WITHOUT re-exchanging the (large) edge
    # side — the only per-iteration shuffle is the contribution aggregation
    # itself. (localCheckpoint would lose the partitioning metadata —
    # LogicalRDD reports UnknownPartitioning — so persist() carries the
    # co-partitioning and periodic localCheckpoints bound plan growth.)
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # int-packing (see cc.py): when ids fit in int32, the persisted edge
    # cache, the distinct, and every per-iteration scan/shuffle run at half
    # the key width. One shuffle-free min/max pass decides; the public
    # (vertex long, rank double) schema is restored on return.
    rng = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    packed = (
        rng["lo"] is not None
        and rng["lo"] >= -2147483648
        and rng["hi"] <= 2147483647
        # packing re-projects src, which erases the bucketed relation's
        # KNOWN HashPartitioning and would re-introduce a per-iteration
        # edge-side exchange — the pre-partitioned caller stores the table
        # at its chosen width instead
        and not pre_partitioned
    )
    if packed:
        edges = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    # sortWithinPartitions: the cached relation keeps its ordering metadata,
    # so the per-iteration sort-merge join re-sorts only the (small) ranks
    # side — never the E-row edge side (measured 5x per-iteration win)
    e = edges.select("src", "dst")
    if not assume_distinct:
        e = e.distinct()
    if not pre_partitioned:
        e = e.repartition(p, "src").sortWithinPartitions("src")
    e = e.persist()
    verts = _truncate(vertices(e))
    n = verts.count()
    if n == 0:
        return PageRankResult(
            verts.select(
                F.col("vertex").cast("long").alias("vertex"),
                F.lit(0.0).alias("rank"),
            ),
            0,
            True,
        )

    out_deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_deg")
    )
    # static per-vertex frame: out_deg (0 → dangling), reused every iteration
    vstat = verts.join(out_deg, "vertex", "left").select(
        "vertex", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
    )

    if init_ranks is None:
        ranks = _truncate(
            vstat.select("vertex", "out_deg", F.lit(1.0 / n).alias("rank"))
        )
    else:
        ir = init_ranks.select(
            F.col("vertex").cast("int" if packed else "long").alias("vertex"),
            F.col("rank").cast("double").alias("init_rank"),
        )
        ranks = _truncate(
            vstat.join(ir, "vertex", "left").select(
                "vertex",
                "out_deg",
                F.coalesce("init_rank", F.lit(1.0 / n)).alias("rank"),
            )
        )

    n_edges = e.count()

    # O13 two-level treatment for the per-dst contribution sum (skew.py
    # rationale; min/sum are decomposable). NOTE: the salted path reassociates
    # the double additions — ranks agree with the unsalted path to ~1e-15
    # relative (well inside the 1e-6 parity gate), not bit-for-bit; hash-exact
    # oracle queries run on small graphs where auto-detection never fires.
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
    if init_ranks is None:
        # danglesum for iteration 0 (x0 uniform): alpha * n_dangling / n
        dangle0 = ranks.where(F.col("out_deg") == 0).count()
        danglesum = alpha * dangle0 / n
    else:
        d0 = (
            ranks.where(F.col("out_deg") == 0)
            .agg(F.sum("rank").alias("s"))
            .collect()[0]["s"]
        )
        danglesum = alpha * (d0 or 0.0)
    for it in range(iters):
        t0 = time.time()
        joined = e.join(
            ranks.where(F.col("out_deg") > 0), e.src == F.col("vertex")
        )
        if use_salting:
            # partial sum per (dst, salt-of-src), final sum per dst — a hub
            # dst spreads over num_salts reduce tasks (skew.py O13)
            partial = (
                joined.select(
                    F.col("dst"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                    F.pmod(F.xxhash64(e.src), F.lit(num_salts))
                    .cast("int")
                    .alias("_salt"),
                )
                .groupBy("dst", "_salt")
                .agg(F.sum("c").alias("_p"))
            )
            contribs = partial.groupBy(F.col("dst").alias("vertex")).agg(
                F.sum("_p").alias("contrib")
            )
        else:
            contribs = (
                joined.select(
                    F.col("dst").alias("vertex"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
                .groupBy("vertex")
                .agg(F.sum("c").alias("contrib"))
            )
        base = danglesum / n + (1.0 - alpha) / n
        new_ranks = ranks.join(contribs, "vertex", "left").select(
            "vertex",
            "out_deg",
            F.col("rank").alias("old_rank"),
            (F.lit(alpha) * F.coalesce("contrib", F.lit(0.0)) + F.lit(base)).alias(
                "rank"
            ),
        )
        # plan truncation EVERY iteration (the logical tree otherwise grows
        # exponentially — ranks is referenced twice per iteration); the
        # resulting UnknownPartitioning only costs a V-row exchange of the
        # ranks side next iteration — the persisted E-row edge side is never
        # re-shuffled
        new_ranks = _truncate(new_ranks)
        # ONE action per superstep: L1 error + NEXT iteration's dangling mass
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("err"),
            F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).alias("dangle"),
        ).collect()[0]
        err = row["err"]
        danglesum = alpha * (row["dangle"] or 0.0)
        wall = time.time() - t0
        if fixed_iters is None:
            converged = err < n * tol
        ranks = new_ranks.select("vertex", "out_deg", "rank")
        gc.collect()  # drop py4j refs to superseded checkpoint RDDs promptly
        metrics.append(
            {
                "iter": it,
                "l1_err": err,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if converged:
            break
    if fixed_iters is not None:
        converged = True
    e.unpersist()  # final ranks are persisted+materialized; edges can go
    out = ranks.select(
        F.col("vertex").cast("long").alias("vertex"), "rank"
    ) if packed else ranks.select("vertex", "rank")
    return PageRankResult(out, it + 1, converged, metrics)


def pagerank_single_node(
    pairs: list[tuple[int, int]],
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict[int, float]:
    """Single-node reference implementation — the parity oracle.

    Replicates networkx's pure-Python power iteration exactly (uniform start,
    dangling mass redistributed uniformly, L1 stop err < N·tol). networkx
    3.6 delegates ``pagerank`` to scipy, which this sandbox lacks
    (SURVEY.md §0 [env]), so the oracle is spelled out here; the semantics are
    the published PageRank recurrence, public knowledge.
    """
    from collections import defaultdict

    succ: dict[int, set[int]] = defaultdict(set)
    nodes: set[int] = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        succ[u].add(v)  # simple-graph semantics: duplicates collapse via the set
    n = len(nodes)
    if n == 0:
        return {}
    p = 1.0 / n
    x = {v: p for v in nodes}
    dangling = [v for v in nodes if not succ[v]]
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        xlast = x
        x = {v: 0.0 for v in nodes}
        danglesum = alpha * sum(xlast[v] for v in dangling)
        for v in nodes:
            od = len(succ[v])
            for nbr in succ[v]:
                x[nbr] += alpha * xlast[v] / od
        for v in nodes:
            x[v] += danglesum * p + (1.0 - alpha) * p
        if fixed_iters is None:
            err = sum(abs(x[v] - xlast[v]) for v in nodes)
            if err < n * tol:
                return x
    if fixed_iters is None:
        raise RuntimeError(f"single-node pagerank did not converge in {max_iter}")
    return x


def pagerank_checkpointed(
    spark: SparkSession,
    edges: DataFrame,
    *,
    checkpoint_dir: str,
    fixed_iters: int,
    checkpoint_every: int = 1,
    alpha: float = 0.85,
    resume: bool = True,
    checkpoint_format: str = "parquet",
    **kw,
) -> PageRankResult:
    """Durable checkpoint/resume for PageRank — the O2 machinery CC has,
    on the rank vector (north rule: "resumable from checkpoint with
    per-partition lineage + metrics" names PageRank too).

    One PR step is AFFINE (r' = αAᵀr + b), so k warm iterations from a
    j-iteration vector equal j+k cold iterations on the same graph
    BIT-FOR-BIT (the ``pagerank_warm_bipartite`` gate row pins the
    composition). That exactness is what makes durable chunking safe:
    this wrapper runs ``fixed_iters`` total iterations in
    ``checkpoint_every``-sized chunks, writing the rank vector atomically
    (sources/checkpoint.py manifest: per-file lineage, metrics, params)
    after each chunk, and on restart resumes from the newest valid
    snapshot via ``init_ranks`` — the final ranks are identical to an
    uninterrupted run (pytest-pinned). Fixed-iteration contract only:
    a convergence test would need its residual stream to cross chunks.

    Safety rails mirror CC's (ADVICE r2 #1–#3): every manifest records
    the INPUT-EDGE FINGERPRINT (count + order-free bounded hash-sum) and
    alpha — the two properties a rank snapshot is a pure function of
    (``fixed_iters`` is deliberately NOT a compatibility key: a snapshot
    at step j is just "j iterations of (alpha, edges)", so relaunching
    with a LARGER target legitimately resumes and extends it). A resume
    against a drifted edge table, a different alpha, or a snapshot past
    the requested target clears the stale steps and restarts cold —
    composing yesterday's ranks with today's edges would be silently
    wrong, never detectably wrong. Each resumed chunk reads the snapshot
    back from the checkpoint (not driver lineage), so plan lineage
    truncates at every chunk boundary.
    """
    from ..sources import checkpoint as ckpt

    assert fixed_iters >= 1 and checkpoint_every >= 1
    rng = edges.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))
        ).alias("s"),
    ).collect()[0]
    edge_fp = f"{rng['n']}:{rng['s'] or 0}"
    params = {"kernel": "pagerank", "alpha": alpha, "edge_fp": edge_fp}
    done = 0
    ranks: DataFrame | None = None
    if resume:
        latest = ckpt.latest_valid_step(checkpoint_dir)
        if latest is not None:
            m = ckpt.read_manifest(checkpoint_dir, latest)
            if ckpt.compatible_params(m, params) and latest <= fixed_iters:
                done = latest
                ranks = ckpt.read_checkpoint(spark, checkpoint_dir, latest)
            else:
                ckpt.clear_steps(checkpoint_dir)
    metrics: list[dict] = []
    while done < fixed_iters:
        k = min(checkpoint_every, fixed_iters - done)
        res = pagerank(
            spark,
            edges,
            alpha=alpha,
            fixed_iters=k,
            init_ranks=ranks,
            **kw,
        )
        done += k
        ckpt.write_checkpoint(
            res.ranks,
            checkpoint_dir,
            done,
            metrics={"iters_done": done, "chunk_iters": k},
            params=params,
            table_format=checkpoint_format,
        )
        ranks = ckpt.read_checkpoint(spark, checkpoint_dir, done)
        metrics.extend(res.metrics)
    if ranks is None:  # fully resumed at fixed_iters already
        ranks = ckpt.read_checkpoint(spark, checkpoint_dir, fixed_iters)
    return PageRankResult(ranks, fixed_iters, True, metrics)
