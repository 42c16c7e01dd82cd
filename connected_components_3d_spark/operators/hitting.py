"""Truncated hitting time to a seed set — the random-walk proximity
measure of Sarkar & Moore (UAI 2007, "A tractable approach to finding
closest truncated-commute-time neighbors in large graphs"): for the
uniform random walk on the DIRECTED edge table, h_T(v) is the expected
number of steps to first reach the seed set S, truncated at horizon T
(walks that don't hit within T count as T). On a web graph this is the
"random-surfer distance" to a trusted / topical seed set — the
hitting-time counterpart of TrustRank's mass propagation (smaller = closer
to S), robust where shortest-path distance ignores edge multiplicity.

Recurrence (the contract both the single-node oracle and the DuckDB
chained-CTE gate oracle replay):

    h_0(v) = 0
    h_t(v) = 0                                   v ∈ S
           = t                                   v dangling (no out-edges)
           = 1 + avg_{u ∈ out(v)} h_{t-1}(u)     otherwise

(the min(t, ·) of the textbook definition is implied: 1 + avg ≤ 1 + (t−1)
inductively, and the dangling row is the stuck-walk boundary case). Values
live in [0, T]; h_T(v) = T means "no walk from v hits S within T" — in
particular every vertex with no directed path to S pins at T. Per-vertex
doubles: the gate row rounds to 8 decimals to absorb cross-engine sum
reassociation (~1e-16), the same rule as _pagerank_sql.

Scale shape (SURVEY.md §4.3): the adjacency is laid down once
(hash-partitioned + sorted by src, persisted — the O7 layout); each of the
T supersteps is ONE edge-sized sort-merge join (state joined on dst) plus
a src-keyed AVG (partial+final — vertex-sized shuffle) and a vertex-sized
left join to re-attach seeds/danglings. State is localCheckpointed per
step (flat lineage). Iteration count is the fixed horizon — no convergence
actions at all.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class HittingTimeResult:
    # (vertex:long, h:double) — truncated expected steps to reach S, in [0, T]
    times: DataFrame
    horizon: int
    metrics: list[dict] = field(default_factory=list)


def truncated_hitting_time(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    horizon: int = 8,
) -> HittingTimeResult:
    """Expected truncated hitting time h_T(v) to the seed set over the
    DIRECTED edge table ``(src, dst)`` — see module docstring for the
    exact recurrence. ``seeds`` is a DataFrame with a ``vertex`` column;
    seeds need not appear in the edge table (they still report h = 0)."""
    assert 1 <= horizon <= 1000
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    sd = seeds.select(F.col("vertex").cast("long")).distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .union(sd.select("vertex"))
        .distinct()
    )
    # static per-vertex class: seed (h=0 always) / dangling (h=t) / walker
    cls = (
        verts.join(sd.withColumn("is_seed", F.lit(1)), "vertex", "left")
        .join(
            e.select(F.col("src").alias("vertex"))
            .distinct()
            .withColumn("has_out", F.lit(1)),
            "vertex",
            "left",
        )
        .select(
            "vertex",
            (F.col("is_seed").isNotNull()).alias("seed"),
            (F.col("has_out").isNotNull()).alias("has_out"),
        )
        .persist()
    )
    h = cls.select("vertex", F.lit(0.0).alias("h")).localCheckpoint(
        eager=True
    )
    metrics: list[dict] = []
    for t in range(1, horizon + 1):
        t0 = time.time()
        nbr = (
            e.join(h.withColumnRenamed("vertex", "dst"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.avg("h").alias("avg_h"))
        )
        h = (
            cls.join(nbr, "vertex", "left")
            .select(
                "vertex",
                F.when(F.col("seed"), F.lit(0.0))
                .when(~F.col("has_out"), F.lit(float(t)))
                .otherwise(F.lit(1.0) + F.col("avg_h"))
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        metrics.append({"step": t, "wall_s": round(time.time() - t0, 4)})
    e.unpersist()
    cls.unpersist()
    return HittingTimeResult(h, horizon, metrics)


def truncated_hitting_time_single_node(
    pairs: list[tuple[int, int]],
    seeds: list[int],
    *,
    horizon: int = 8,
) -> dict[int, float]:
    """Single-node reference — the pytest parity oracle (same recurrence,
    pure Python floats; neighbor averages summed in sorted-dst order)."""
    succ: dict[int, list[int]] = {}
    nodes: set[int] = set(seeds)
    for u, v in set(pairs):
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, []).append(v)
    for vs in succ.values():
        vs.sort()
    sset = set(seeds)
    h = {v: 0.0 for v in nodes}
    for t in range(1, horizon + 1):
        nh = {}
        for v in nodes:
            if v in sset:
                nh[v] = 0.0
            elif v not in succ:
                nh[v] = float(t)
            else:
                nh[v] = 1.0 + sum(h[u] for u in succ[v]) / len(succ[v])
        h = nh
    return h
