"""Weighted PageRank — power iteration over a weighted edge table, the
kernel behind host-level PageRank (the weighted host graph is the classic
input: edge weight = number of page-level links between the two hosts).

Same published recurrence as operators/pagerank.py with out-degree replaced
by out-WEIGHT (networkx ``pagerank(G, weight=...)`` semantics, float64):

  x0 = 1/N;  per iteration
  danglesum = alpha * Σ x_last[wout = 0]
  x[v] = alpha * Σ_{u→v} x_last[u]·w(u,v)/wout(u) + danglesum/N + (1−alpha)/N
  stop when Σ|x − x_last| < N·tol

Duplicate (src, dst) rows collapse by SUMMING their weights (multigraph →
weighted simple graph — networkx MultiDiGraph parity); non-positive-weight
rows are dropped (a zero/negative "link count" is meaningless and would
break the dangling test).

Spark shape per iteration — identical to the unweighted kernel's proven
100 TB layout: the weighted edge table is shuffle-partitioned by src ONCE,
sorted within partitions and persisted; each iteration runs one edges⋈ranks
sort-merge join (re-sorting only the V-row ranks side), one groupBy(dst)
partial+final SUM, and ONE scalar action (L1 error + next danglesum in the
same pass). Hot in-degree hubs take the same salted two-level aggregation
as pagerank.py behind the same auto-detector. The host graph this kernel
targets is ~4 orders of magnitude smaller than its page graph (10^7 hosts
vs 10^11 page edges), so the expensive step at 100 TB is the host_graph
projection scan, not this loop.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class WeightedPageRankResult:
    ranks: DataFrame  # (vertex:long, rank:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def weighted_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str = "weight",
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    salting: bool | str = "auto",
    num_salts: int = 8,
    hot_key_threshold: int = 10_000_000,
    salting_min_edges: int = 10_000_000,
) -> WeightedPageRankResult:
    """Weighted PageRank on the DIRECTED (src, dst, weight) table. Vertex
    ids may be any orderable type with a stable string form (longs or host
    strings — the host graph feeds strings directly); the output ``vertex``
    column keeps the input type."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )
        .where(F.col("w") > 0)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    verts = _truncate(vertices(e.select("src", "dst")))
    n = verts.count()
    if n == 0:
        return WeightedPageRankResult(
            verts.select("vertex", F.lit(0.0).alias("rank")), 0, True
        )

    wout = e.groupBy(F.col("src").alias("vertex")).agg(
        F.sum("w").alias("wout")
    )
    vstat = verts.join(wout, "vertex", "left").select(
        "vertex", F.coalesce("wout", F.lit(0.0)).alias("wout")
    )
    ranks = _truncate(
        vstat.select("vertex", "wout", F.lit(1.0 / n).alias("rank"))
    )
    n_edges = e.count()

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
    dangle0 = ranks.where(F.col("wout") == 0.0).count()
    danglesum = alpha * dangle0 / n
    for it in range(iters):
        t0 = time.time()
        joined = e.join(
            ranks.where(F.col("wout") > 0.0), e.src == F.col("vertex")
        )
        contrib_expr = (F.col("rank") * F.col("w") / F.col("wout")).alias("c")
        if use_salting:
            partial = (
                joined.select(
                    F.col("dst"),
                    contrib_expr,
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
                joined.select(F.col("dst").alias("vertex"), contrib_expr)
                .groupBy("vertex")
                .agg(F.sum("c").alias("contrib"))
            )
        base = danglesum / n + (1.0 - alpha) / n
        new_ranks = ranks.join(contribs, "vertex", "left").select(
            "vertex",
            "wout",
            F.col("rank").alias("old_rank"),
            (
                F.lit(alpha) * F.coalesce("contrib", F.lit(0.0)) + F.lit(base)
            ).alias("rank"),
        )
        new_ranks = _truncate(new_ranks)
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("err"),
            F.sum(F.when(F.col("wout") == 0.0, F.col("rank"))).alias(
                "dangle"
            ),
        ).collect()[0]
        err = row["err"]
        danglesum = alpha * (row["dangle"] or 0.0)
        wall = time.time() - t0
        if fixed_iters is None:
            converged = err < n * tol
        ranks = new_ranks.select("vertex", "wout", "rank")
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
    return WeightedPageRankResult(
        ranks.select("vertex", "rank"), it + 1, converged, metrics
    )


def host_pagerank(
    spark: SparkSession,
    page_edges: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> WeightedPageRankResult:
    """Host-level PageRank: project page URLs to the weighted host graph
    (operators/hostgraph.py, intra-host edges dropped) and run weighted
    PageRank over it. ``vertex`` in the result is the host string."""
    from .hostgraph import host_graph

    hg = host_graph(page_edges, src_col=src_col, dst_col=dst_col)
    return weighted_pagerank(
        spark,
        hg.select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
            "weight",
        ),
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        fixed_iters=fixed_iters,
    )


def weighted_pagerank_single_node(
    triples: list[tuple],
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict:
    """Single-node reference for the pytest parity gate — the module
    docstring's recurrence spelled out (networkx weighted-pagerank
    semantics, public knowledge)."""
    from collections import defaultdict

    wsucc: dict = defaultdict(lambda: defaultdict(float))
    nodes: set = set()
    for u, v, w in triples:
        if w <= 0:
            continue
        nodes.add(u)
        nodes.add(v)
        wsucc[u][v] += float(w)
    n = len(nodes)
    if n == 0:
        return {}
    wout = {u: sum(ws.values()) for u, ws in wsucc.items()}
    x = {v: 1.0 / n for v in nodes}
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        xlast = x
        x = {v: 0.0 for v in nodes}
        danglesum = alpha * sum(
            xlast[v] for v in nodes if not wout.get(v)
        )
        for u, ws in wsucc.items():
            for v, w in ws.items():
                x[v] += alpha * xlast[u] * w / wout[u]
        for v in nodes:
            x[v] += danglesum / n + (1.0 - alpha) / n
        if fixed_iters is None:
            err = sum(abs(x[v] - xlast[v]) for v in nodes)
            if err < n * tol:
                return x
    if fixed_iters is None:
        raise RuntimeError("single-node weighted pagerank did not converge")
    return x
