"""Personalized PageRank: power iteration with a seed-restricted teleport.

Link-graph companion to operators/pagerank.py (O7) — same Spark layout
decisions (edge table hash-partitioned by src + sorted + persisted ONCE;
per-iteration shuffle is the vertex-sized contribution aggregation only;
ONE scalar action closes each iteration), different recurrence:

  seeds S ⊆ V, teleport vector t[v] = 1/|S| if v ∈ S else 0
  x0 = t;  per iteration
  danglesum = alpha * Σ x_last[dangling]
  x[v] = alpha * Σ_{u→v} x_last[u]/outdeg(u) + (danglesum + 1-alpha) * t[v]

i.e. both the (1-alpha) restart mass and the dangling mass return to the
SEED distribution, not uniformly — the standard personalized variant
(random walk with restart). Rank mass therefore stays a probability
distribution concentrated around S.

Lives in its own module rather than as a pagerank() flag: the uniform
kernel is the north-rule benchmark surface and stays byte-stable; the
teleport vector here is a V-row column (seed indicator), joined once into
the static per-vertex frame, where the uniform kernel needs only scalars.

Deterministic fixed-iteration contract for the driver gate
(``ppr_bipartite`` + chained-CTE DuckDB oracle, hash-exact after
ROUND(…, 8)); convergence mode stops at L1 err < |V|·tol like pagerank.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class PPRResult:
    ranks: DataFrame  # (vertex:long, rank:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> PPRResult:
    """PPR over the DIRECTED edge table, personalized on ``seeds``
    (a one-column ``vertex`` DataFrame; seeds outside the graph's vertex
    set are ignored; duplicates collapse). Simple-graph semantics
    (duplicate edges dropped), float64 throughout."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
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
        seeds = seeds.select(F.col("vertex").cast("int").alias("vertex"))
    e = (
        edges.select("src", "dst")
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    verts = _truncate(vertices(e))
    n = verts.count()
    if n == 0:
        empty = verts.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.lit(0.0).alias("rank"),
        )
        return PPRResult(empty, 0, True)

    out_deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_deg")
    )
    seed_set = seeds.select("vertex").distinct()
    # static per-vertex frame: out_deg + the teleport vector t (seed
    # indicator / |S∩V|), built once and reused every iteration
    vstat = (
        verts.join(out_deg, "vertex", "left")
        .join(seed_set.withColumn("_is_seed", F.lit(1)), "vertex", "left")
        .select(
            "vertex",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("_is_seed", F.lit(0)).alias("_is_seed"),
        )
    )
    n_seeds = vstat.agg(F.sum("_is_seed").alias("s")).collect()[0]["s"] or 0
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is a graph vertex")
    vstat = _truncate(
        vstat.select(
            "vertex",
            "out_deg",
            (F.col("_is_seed") / F.lit(float(n_seeds))).alias("t"),
        )
    )
    ranks = _truncate(vstat.select("vertex", "out_deg", "t", F.col("t").alias("rank")))
    n_edges = e.count()

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    # danglesum for iteration 0: alpha * Σ t[dangling]
    d0 = (
        ranks.where(F.col("out_deg") == 0)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    danglesum = alpha * d0
    for it in range(iters):
        t0 = time.time()
        contribs = (
            e.join(
                ranks.where(F.col("out_deg") > 0).select(
                    "vertex", "rank", "out_deg"
                ),
                e.src == F.col("vertex"),
            )
            .select(
                F.col("dst").alias("vertex"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("contrib"))
        )
        restart = danglesum + (1.0 - alpha)  # mass returned to the seed vector
        new_ranks = ranks.join(contribs, "vertex", "left").select(
            "vertex",
            "out_deg",
            "t",
            F.col("rank").alias("old_rank"),
            (
                F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))
                + F.lit(restart) * F.col("t")
            ).alias("rank"),
        )
        new_ranks = _truncate(new_ranks)
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("err"),
            F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).alias("dangle"),
        ).collect()[0]
        err = row["err"]
        danglesum = alpha * (row["dangle"] or 0.0)
        wall = time.time() - t0
        if fixed_iters is None:
            converged = err < n * tol
        ranks = new_ranks.select("vertex", "out_deg", "t", "rank")
        completed += 1
        gc.collect()
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
    e.unpersist()
    out = (
        ranks.select(F.col("vertex").cast("long").alias("vertex"), "rank")
        if packed
        else ranks.select("vertex", "rank")
    )
    return PPRResult(out, completed, converged, metrics)


def ppr_single_node(
    pairs: list[tuple[int, int]],
    seeds: list[int],
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict[int, float]:
    """Single-node reference for the pytest parity gate — same recurrence
    as the module docstring (random walk with restart; public knowledge)."""
    succ: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, set()).add(v)
    s_in = [s for s in sorted(set(seeds)) if s in nodes]
    if not nodes:
        return {}
    if not s_in:
        raise ValueError("no seed is a graph vertex")
    t = {v: (1.0 / len(s_in) if v in s_in else 0.0) for v in nodes}
    x = dict(t)
    n = len(nodes)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        dang = alpha * sum(x[v] for v in nodes if not succ.get(v))
        nxt = {v: 0.0 for v in nodes}
        for u, outs in succ.items():
            if not outs:
                continue
            w = alpha * x[u] / len(outs)
            for v in outs:
                nxt[v] += w
        restart = dang + (1.0 - alpha)
        for v in nodes:
            nxt[v] += restart * t[v]
        err = sum(abs(nxt[v] - x[v]) for v in nodes)
        x = nxt
        if fixed_iters is None and err < n * tol:
            break
    return x
