"""Batch personalized PageRank — MANY seed groups diffused in one pass
over the graph. The single-seed-set operator (operators/ppr.py) answers
"what's near THIS set"; feature pipelines ask for hundreds of such
vectors at once (per-topic seeds, per-user-cohort seeds, PPR features
for link prediction). Running ppr.py G times scans the edge cache G
times; this kernel carries the group as a STATE DIMENSION and scans the
edges once per iteration for all groups together.

Sparse state is the scale contract: the state table holds only
(vertex, grp) rows with rank > 0 — a group's support grows one hop per
iteration from its seeds (plus the seeds themselves, which always carry
restart mass), so state is O(Σ_g |support_g|), NOT G×V. The
per-iteration work is one edge⋈state join keyed on src (the persisted
sorted edge cache from the ppr.py layout, never re-shuffled) + a
(vertex, grp)-keyed aggregation + a full-outer merge with the seed
teleport rows. Per-group dangling mass is a G-row aggregate joined back
broadcast — G scalars never touch the driver except the convergence
check.

Recurrence per group g (identical to ppr.py, independent across g):
  t_g[v] = 1/|S_g∩V| on seeds, else 0;  x0 = t
  danglesum_g = α · Σ x_last[dangling, g]
  x[v,g] = α·Σ_{u→v} x_last[u,g]/outdeg(u) + (danglesum_g + 1−α)·t_g[v]

Support equivalence: x[v,g] > 0 exactly when v is a seed of g or within
i hops of one, so the sparse state equals the dense recurrence filtered
to rank > 0 — which is how the `batch_ppr_bipartite` gate row can
hash-match a DENSE chained-CTE DuckDB replay filtered to rank > 0
(ROUND(…, 8) absorbing sum reassociation, the ppr.py contract).
Vertex ids stay long (no int-packing here — the state key is the
(vertex, grp) pair; pack when G×support pressure ever warrants it).
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class BatchPPRResult:
    ranks: DataFrame  # (vertex:long, grp:long, rank:double), rank > 0 rows
    num_iters: int
    converged: bool
    num_groups: int
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def batch_personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> BatchPPRResult:
    """PPR for every seed group in ``seeds`` (vertex, grp) over the
    DIRECTED edge table (simple-graph semantics). Seeds outside the
    vertex set are ignored; a group with no valid seed raises. Stops
    when EVERY group's L1 error is below |V|·tol (or after
    ``fixed_iters``)."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    verts = _truncate(vertices(e))
    n = verts.count()
    sd = seeds.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("grp").cast("long").alias("grp"),
    ).distinct()
    n_groups_in = sd.select("grp").distinct().count()
    if n == 0:
        empty = spark.createDataFrame([], "vertex long, grp long, rank double")
        return BatchPPRResult(empty, 0, True, 0)

    out_deg = e.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_deg")
    )
    # per-group teleport rows: only seeds that ARE graph vertices count
    sd = sd.join(verts, "vertex")
    sizes = sd.groupBy("grp").agg(F.count("*").alias("ns"))
    if sizes.count() != n_groups_in:
        raise ValueError(
            "batch_personalized_pagerank: some group has no seed in the graph"
        )
    seed_t = _truncate(
        sd.join(sizes, "grp")
        .select("vertex", "grp", (F.lit(1.0) / F.col("ns")).alias("t"))
        .repartition(p, "vertex")
    )
    deg_of = out_deg  # (vertex, out_deg); absent → dangling
    state = _truncate(
        seed_t.select("vertex", "grp", F.col("t").alias("rank"))
    )
    n_edges = e.count()
    n_groups = n_groups_in

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    for it in range(iters):
        t0 = time.time()
        st = state.join(deg_of, "vertex", "left").select(
            "vertex",
            "grp",
            "rank",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
        # per-group dangling mass — a G-row aggregate, joined back broadcast
        dangle = st.where(F.col("out_deg") == 0).groupBy("grp").agg(
            F.sum("rank").alias("dsum")
        )
        contribs = (
            e.join(
                st.where(F.col("out_deg") > 0),
                e.src == F.col("vertex"),
            )
            .select(
                F.col("dst").alias("vertex"),
                "grp",
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("vertex", "grp")
            .agg(F.sum("c").alias("contrib"))
        )
        # merge contribution rows with teleport rows (full outer: a seed
        # may receive no contribution; a contrib target may not be a seed)
        merged = contribs.join(seed_t, ["vertex", "grp"], "full").join(
            F.broadcast(dangle), "grp", "left"
        )
        new_state = merged.select(
            "vertex",
            "grp",
            (
                F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))
                + (
                    F.lit(alpha) * F.coalesce("dsum", F.lit(0.0))
                    + F.lit(1.0 - alpha)
                )
                * F.coalesce("t", F.lit(0.0))
            ).alias("rank"),
        ).where(F.col("rank") > 0)
        new_state = _truncate(new_state.repartition(p, "vertex"))
        completed += 1
        if fixed_iters is None:
            err = (
                new_state.join(
                    state.select(
                        "vertex", "grp", F.col("rank").alias("old_rank")
                    ),
                    ["vertex", "grp"],
                    "full",
                )
                .groupBy("grp")
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce("rank", F.lit(0.0))
                            - F.coalesce("old_rank", F.lit(0.0))
                        )
                    ).alias("err")
                )
                .agg(F.max("err").alias("worst"))
                .collect()[0]["worst"]
            )
            converged = (err or 0.0) < n * tol
        state = new_state
        wall = time.time() - t0
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if converged:
            break
    if fixed_iters is not None:
        converged = True
    e.unpersist()
    return BatchPPRResult(state, completed, converged, n_groups, metrics)
