"""k-core: the maximal subgraph in which every vertex has degree ≥ k.

Web-graph companion to the component statistics family (SURVEY.md §2 R7–R10
"dust"): where ``dust`` drops SMALL components, the k-core drops WEAKLY
CONNECTED vertices — the standard link-graph filter for separating a densely
linked core from tendrils before ranking or community detection.

Distributed shape (iterative peeling, the textbook parallel algorithm):

  e_0 = canonical undirected simple edges
  round i: deg_i = degree over e_{i-1};  keep_i = {v : deg_i(v) ≥ k}
           e_i = e_{i-1} semi-joined to keep_i on BOTH endpoints
  fixpoint when no vertex is dropped.

Each round is one vertex-sized hash aggregation plus two semi-joins on the
(monotonically shrinking) edge table — no windows, no collects beyond the
per-round convergence scalar. The edge table is re-persisted per round and
the previous round unpersisted, so peak storage is two generations of a
shrinking table. At web scale most mass is peeled in the first 2-3 rounds
(degree distributions are heavy-tailed), after which rounds are cheap; the
round count is bounded by the degeneracy ordering depth, small in practice.

The converged k-core is UNIQUE (standard result), so the driver gate can
hash-compare the converged Spark output against a chained-CTE DuckDB replay
with a fixed round budget ≥ the fixpoint depth (extra rounds are no-ops).

Output: one row per k-core vertex with its degree INSIDE the core —
``(vertex:long, kcore_deg:long)``; empty (same schema) when the core is.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected


@dataclass
class KCoreResult:
    core: DataFrame  # (vertex:long, kcore_deg:long)
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 200,
) -> KCoreResult:
    """Peel ``edges`` (treated as undirected, self-loops/dups dropped) down
    to the k-core. ``k >= 2``; for k ≤ 1 the k-core is the whole simple
    graph minus isolated vertices, which the same loop returns in 0 rounds.
    """
    if k < 0:
        raise ValueError("k_core: k must be non-negative")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        canonical_undirected(edges)
        .repartition(p, "src")
        .persist()
    )
    e.count()  # materialize the persisted canonical edge table once
    metrics: list[dict] = []
    converged = False
    rounds = 0
    for rounds in range(max_rounds + 1):
        deg = (
            e.select(F.col("src").alias("vertex"))
            .unionAll(e.select(F.col("dst").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("vertex")
        # one scalar action per round: vertices dropped this round
        dropped = (
            deg.agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("deg") >= k, 1).otherwise(0)).alias("kept"),
            ).collect()[0]
        )
        n_dropped = dropped["n"] - (dropped["kept"] or 0)
        metrics.append(
            {"round": rounds, "vertices": dropped["n"], "dropped": n_dropped}
        )
        if n_dropped == 0:
            converged = True
            break
        keep = _truncate(keep)
        nxt = (
            e.join(keep.withColumnRenamed("vertex", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("vertex", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(p, "src")
            .persist()
        )
        nxt.count()
        e.unpersist()
        e = nxt
    core = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("kcore_deg"))
    )
    # truncate before unpersisting the last edge generation: the core is
    # vertex-sized, while its raw lineage chains through every peel round
    out = _truncate(
        core.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col("kcore_deg").cast("long").alias("kcore_deg"),
        )
    )
    e.unpersist()
    return KCoreResult(out, rounds, converged, metrics)


def k_core_single_node(
    pairs: list[tuple[int, int]], k: int
) -> dict[int, int]:
    """Single-node peeling reference for the pytest gate (same semantics;
    public textbook algorithm). Returns {vertex: degree inside the core}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        drop = [v for v, nb in adj.items() if len(nb) < k]
        changed = bool(drop)
        for v in drop:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    return {v: len(nb) for v, nb in adj.items() if nb}
