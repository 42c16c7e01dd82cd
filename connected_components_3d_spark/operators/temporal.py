"""Temporal earliest-arrival reachability — time-respecting shortest
arrival over a temporal edge table (src, dst, t): information available at
vertex u from time ea(u) can cross an edge (u, v, t) only if t ≥ ea(u),
arriving at v at time t. The earliest-arrival problem is THE canonical
temporal-graph primitive (Wu/Cheng/Huang/Ke/Lu VLDB 2014 "Path Problems in
Temporal Graphs"); on web/event data it answers "when could this
information / infection / meme first have reached v" — static reachability
over the same edges OVERSTATES reach because it ignores edge ordering (a
path that uses an edge before the information arrived is not traversable).

Recurrence (label-correcting frontier relaxation — sssp.py's envelope with
(+, min) replaced by the temporal gate):

    ea_0(s) = t0(s) for seeds s
    round r:  cand(v) = MIN over in-edges (u, v, t) with u in
                        frontier_{r-1} and t ≥ ea(u), of t
              improved = {v : cand(v) < ea(v) or v unseen}
    fixpoint when a round improves nothing (bounded by the longest
    time-respecting path's hop count).

Earliest arrivals are a unique fixpoint, so (vertex, arrival) is
hash-comparable: the driver gate replays a fixed-round chained CTE of the
FULL (non-frontier) relaxation in DuckDB — identical at fixpoint, rounds
past it are no-ops, so the pinned count only needs to be ≥ the measured
depth (`temporal_reach_events`, over a co-presence temporal graph derived
from the events table with the cooccurrence.py hub cap).

Scale shape: per round one frontier×edges sort-merge join on the persisted
src-partitioned temporal edge cache (the V-sized frontier side re-shuffles,
the E-row cache never moves), the t ≥ ea(u) gate applied pre-aggregation,
a dst-keyed MIN, and a V-sized merge — ONE scalar count action per round.
Parallel (src,dst) edges are NOT collapsed (different timestamps matter);
the per-pair minimum is NOT sufficient (a later edge may be the only
traversable one), so the cache keeps them all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TemporalReachResult:
    arrivals: DataFrame  # (vertex:long, arrival:long)
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def earliest_arrival(
    spark: SparkSession,
    tedges: DataFrame,
    seeds: DataFrame,
    *,
    time_col: str = "t",
    max_rounds: int = 200,
) -> TemporalReachResult:
    """Earliest time-respecting arrival from ``seeds`` (vertex, t0) along
    directed temporal edges ``(src, dst, t)``. Runs to the fixpoint unless
    ``max_rounds`` stops it first (converged=False; settled arrivals are
    then upper bounds)."""
    e = tedges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(time_col).cast("long").alias("t"),
    ).where(F.col("src") != F.col("dst"))
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(p, "src").sortWithinPartitions("src").persist()
    e.count()  # materialize the cache before the loop
    state = _truncate(
        seeds.select(
            F.col("vertex").cast("long"),
            F.col("t0").cast("long").alias("arrival"),
        )
        .groupBy("vertex")
        .agg(F.min("arrival").alias("arrival"))
    )
    frontier = state
    metrics: list[dict] = []
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        cand = (
            e.join(
                frontier.select(
                    F.col("vertex").alias("src"), F.col("arrival").alias("eu")
                ),
                "src",
            )
            .where(F.col("t") >= F.col("eu"))
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("t").alias("na"))
        )
        improved = (
            cand.join(state, "vertex", "left")
            .where(F.col("arrival").isNull() | (F.col("na") < F.col("arrival")))
            .select("vertex", F.col("na").alias("arrival"))
        )
        improved = _truncate(improved)
        n_imp = improved.count()
        metrics.append({"round": r, "improved": n_imp})
        if n_imp == 0:
            converged = True
            break
        rounds = r
        state = _truncate(
            state.join(improved.select("vertex"), "vertex", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    e.unpersist()
    return TemporalReachResult(state, rounds, converged, metrics)


def latest_departure(
    spark: SparkSession,
    tedges: DataFrame,
    targets: DataFrame,
    *,
    time_col: str = "t",
    max_rounds: int = 200,
) -> TemporalReachResult:
    """Latest time-respecting departure: ld(v) = the latest time one can
    still stand at v and reach some target by its deadline (targets:
    (vertex, t1)); an edge (v, u, t) is usable iff t ≤ ld(u) and departing
    v at time t is possible iff t ≤ (current candidate) — so
    ld(v) = max(deadline_v, max_{(v,u,t): t ≤ ld(u)} t). The dual of
    ``earliest_arrival`` (Wu et al. VLDB 2014 call these the
    latest-departure paths); same frontier envelope with (min, ≥)
    flipped to (max, ≤) and the relaxation running BACKWARD along edges.
    ``arrivals`` in the result carries (vertex, departure:long)."""
    e = tedges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(time_col).cast("long").alias("t"),
    ).where(F.col("src") != F.col("dst"))
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # probe side is the DESTINATION: partition the cache by dst
    e = e.repartition(p, "dst").sortWithinPartitions("dst").persist()
    e.count()
    state = _truncate(
        targets.select(
            F.col("vertex").cast("long"),
            F.col("t1").cast("long").alias("departure"),
        )
        .groupBy("vertex")
        .agg(F.max("departure").alias("departure"))
    )
    frontier = state
    metrics: list[dict] = []
    converged = False
    rounds = 0
    for r in range(1, max_rounds + 1):
        cand = (
            e.join(
                frontier.select(
                    F.col("vertex").alias("dst"),
                    F.col("departure").alias("lu"),
                ),
                "dst",
            )
            .where(F.col("t") <= F.col("lu"))
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.max("t").alias("nd"))
        )
        improved = (
            cand.join(state, "vertex", "left")
            .where(
                F.col("departure").isNull()
                | (F.col("nd") > F.col("departure"))
            )
            .select("vertex", F.col("nd").alias("departure"))
        )
        improved = _truncate(improved)
        n_imp = improved.count()
        metrics.append({"round": r, "improved": n_imp})
        if n_imp == 0:
            converged = True
            break
        rounds = r
        state = _truncate(
            state.join(improved.select("vertex"), "vertex", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    e.unpersist()
    return TemporalReachResult(state, rounds, converged, metrics)


def latest_departure_single_node(
    tedges: list[tuple[int, int, int]],
    targets: list[tuple[int, int]],
) -> dict[int, int]:
    """Single-node reference for latest_departure (full relaxation)."""
    ld: dict[int, int] = {}
    for v, t1 in targets:
        ld[v] = max(ld.get(v, t1), t1)
    changed = True
    while changed:
        changed = False
        for u, v, t in tedges:
            if u == v or v not in ld or t > ld[v]:
                continue
            if u not in ld or t > ld[u]:
                ld[u] = t
                changed = True
    return ld


def earliest_arrival_single_node(
    tedges: list[tuple[int, int, int]],
    seeds: list[tuple[int, int]],
) -> dict[int, int]:
    """Single-node reference: full Bellman-Ford-style relaxation to the
    fixpoint over (src, dst, t) triples from (vertex, t0) seeds."""
    ea: dict[int, int] = {}
    for v, t0 in seeds:
        ea[v] = min(ea.get(v, t0), t0)
    changed = True
    while changed:
        changed = False
        for u, v, t in tedges:
            if u == v or u not in ea or t < ea[u]:
                continue
            if v not in ea or t < ea[v]:
                ea[v] = t
                changed = True
    return ea
