"""Ordered funnel analysis — for a sequence of step predicates (the
classic web-analytics funnel: view → click → buy), count how many entities
completed each prefix of the funnel IN ORDER, optionally within a
conversion window. This is the standard event-log product question
("where do users drop off?") and the natural analytics complement to the
transition-matrix operator.

Semantics (fixed — replayed exactly by the single-node reference and the
DuckDB oracle): an entity completes step k at the EARLIEST event of type
step_k occurring after its step-(k−1) completion in the (ts, event_id)
stream order — the engine-wide deterministic total order — subject to
t_k − t_1 ≤ window when a window is given. The window anchors at the
FIRST-TOUCH step-1 event (the entity's earliest step-1 occurrence), the
"first-touch conversion window" most funnel products default to. That
anchor is a SEMANTIC CHOICE, documented, not an optimization: re-anchoring
at a later step-1 event could occasionally complete deeper, but first-touch
is the deterministic industry reading and makes the per-entity deepest
prefix unique and hash-comparable. For the UNwindowed funnel greedy-
earliest IS optimal (exchange argument: an earlier step-k completion never
shrinks the feasible continuations), so there the count is the true
maximum. Output row k reports n_entities = entities reaching AT LEAST
step k — monotonically non-increasing, the funnel shape.

Scale shape: events are filtered to funnel step types BEFORE the shuffle
(predicate pushdown to the scan), then ONE entity-keyed aggregation does
the whole per-entity greedy scan JVM-side: sort_array over collected
(ts, event_id, step) structs + a native higher-order ``aggregate`` fold
that threads (deepest, t1, t_prev) through the sorted stream — no window
function over the raw log, no Python, per-entity state is O(filtered
events of that entity). The final rollup is a ≤|steps|-row aggregate.
The driver gate hash-compares a per-entity LEAST/chained-scan SQL replay
(`funnel_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    window_us: int | None = None,
) -> DataFrame:
    """Funnel completion counts: (step:int 1-based, step_name:string,
    n_entities:long), n_entities = entities whose ordered event stream
    contains the first k steps in order (within ``window_us`` of the first
    step when given). Rows for every step, including zero-count ones."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel: steps must be distinct, got {steps}")
    step_map = {s: i for i, s in enumerate(steps)}
    spark = events.sparkSession
    # (ts_us, tiebreak, step_idx) structs, pre-filtered to funnel types so
    # only relevant events shuffle; sort_array orders lexicographically =
    # the deterministic (ts, event_id) stream order
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    sidx = F.create_map(
        *[x for s, i in step_map.items() for x in (F.lit(s), F.lit(i))]
    )[F.col(state_col)]
    ev = events.where(F.col(state_col).isin(list(steps))).select(
        F.col(entity_col).alias("ent"),
        F.struct(
            us.alias("t"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            sidx.cast("int").alias("s"),
        ).alias("e"),
    )
    # per-entity greedy fold over the sorted stream, fully JVM-side:
    # acc = (deepest completed step count, t1 of step 1, unused)
    win = F.lit(-1 if window_us is None else int(window_us)).cast("long")
    acc = F.aggregate(
        F.sort_array(F.collect_list("e")),
        F.struct(
            F.lit(0).cast("int").alias("k"),
            F.lit(0).cast("long").alias("t1"),
        ),
        lambda a, e: F.when(
            (e["s"] == a["k"])
            & (
                (a["k"] == 0)  # step 1 anchors the window
                | (win < 0)
                | (e["t"] - a["t1"] <= win)
            ),
            F.struct(
                (a["k"] + F.lit(1)).cast("int").alias("k"),
                F.when(a["k"] == 0, e["t"]).otherwise(a["t1"]).alias("t1"),
            ),
        ).otherwise(a),
    )
    deepest = (
        ev.groupBy("ent")
        .agg(acc.alias("a"))
        .select(F.col("a.k").alias("k"))
        .where(F.col("k") > 0)
        .groupBy("k")
        .agg(F.count("*").alias("n_at"))
    )
    # n_entities(step) = Σ_{k ≥ step} n_at(k): tiny ≤|steps|-row fold
    grid = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        grid.join(deepest, grid.step <= deepest.k, "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("n_at"), F.lit(0)).alias("n_entities"))
    )


def funnel_single_node(
    rows: list[tuple[int, int, int, str]],
    steps: list[str],
    *,
    window_us: int | None = None,
) -> dict[int, int]:
    """Single-node reference over (entity, ts_us, tiebreak, state) rows:
    {step (1-based): n_entities reaching at least that step}."""
    from collections import defaultdict

    idx = {s: i for i, s in enumerate(steps)}
    streams: dict[int, list[tuple[int, int, str]]] = defaultdict(list)
    for ent, ts, tb, st in rows:
        if st in idx:
            streams[ent].append((ts, tb, st))
    deepest: dict[int, int] = {}
    for ent, evs in streams.items():
        evs.sort()
        k, t1 = 0, 0
        for ts, _, st in evs:
            if idx[st] == k and (
                k == 0 or window_us is None or ts - t1 <= window_us
            ):
                if k == 0:
                    t1 = ts
                k += 1
        deepest[ent] = k
    return {
        step: sum(1 for k in deepest.values() if k >= step)
        for step in range(1, len(steps) + 1)
    }
