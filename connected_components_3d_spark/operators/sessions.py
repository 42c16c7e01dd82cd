"""Gap-based sessionization — split each entity's event stream into
sessions wherever the gap to the previous event exceeds ``gap_us``, the
standard web-analytics session definition (GA/Adobe default: 30-minute
inactivity timeout). This is the missing primitive under several operators
already in the engine (the transition matrix consumes per-user streams,
co-occurrence builds session co-access graphs) and the canonical first
step of any clickstream pipeline over Common-Crawl-style logs.

Semantics (fixed — replayed exactly by the single-node reference and the
DuckDB oracle): events of an entity are ordered by the engine-wide
deterministic total order (ts, tiebreak); a session BOUNDARY falls before
event e iff e is the entity's first event or t(e) − t(prev) > gap_us
(strictly greater — a gap of exactly ``gap_us`` stays in-session).
``session_idx`` is the 1-based running count of boundaries, so ids are
dense per entity and deterministic. NULL timestamps are rejected up front
(they would poison the lag comparison silently).

Scale shape: ONE shuffle — a window over (entity) ordered by (t, tb)
computing lag + running SUM of boundary flags, entirely inside
whole-stage codegen (no Python, no collect). At 10^12 events the window
partitions by entity hash exactly like the groupBy every downstream
analytics op needs, so the sort amortizes; per-entity state is the sort
buffer only. ``session_stats`` folds the labeled stream with one further
partial-aggregatable groupBy on (entity, session_idx) — map-side combine
applies because the window already co-located the keys, and AQE coalesces
the tiny post-agg partitions. The driver gate hash-compares both outputs
against the identical-window DuckDB replay (`sessionize_events`,
`session_stats_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_us: int,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Label every event with its session: input columns plus
    (session_idx:long — 1-based per entity, session_seq:long — 1-based
    position within the session). Ordering/boundary rules in the module
    docstring."""
    if gap_us <= 0:
        raise ValueError(f"sessionize: gap_us must be positive, got {gap_us}")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    tb = F.col(tiebreak_col).cast("long")
    w = Window.partitionBy(entity_col).orderBy(t.asc(), tb.asc())
    prev_t = F.lag(t).over(w)
    boundary = F.when(
        prev_t.isNull() | (t - prev_t > F.lit(int(gap_us)).cast("long")),
        F.lit(1),
    ).otherwise(F.lit(0))
    ev = events.withColumn("__b", boundary)
    wrun = (
        Window.partitionBy(entity_col)
        .orderBy(t.asc(), tb.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ev.withColumn(
        "session_idx", F.sum("__b").over(wrun).cast("long")
    )
    wsess = (
        Window.partitionBy(entity_col, "session_idx")
        .orderBy(t.asc(), tb.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn(
        "session_seq", F.count(F.lit(1)).over(wsess).cast("long")
    ).drop("__b")


def session_stats(
    events: DataFrame,
    gap_us: int,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: (entity, session_idx, n_events:long,
    start_us:long, end_us:long, duration_us:long, n_types:long — distinct
    event_type count when the column exists, else omitted)."""
    lab = sessionize(
        events,
        gap_us,
        entity_col=entity_col,
        ts_col=ts_col,
        tiebreak_col=tiebreak_col,
    )
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(t).alias("start_us"),
        F.max(t).alias("end_us"),
        (F.max(t) - F.min(t)).alias("duration_us"),
    ]
    if "event_type" in events.columns:
        aggs.append(
            F.countDistinct("event_type").cast("long").alias("n_types")
        )
    return (
        lab.groupBy(F.col(entity_col), F.col("session_idx"))
        .agg(*aggs)
        .select(
            F.col(entity_col),
            "session_idx",
            *[a for a in ("n_events", "start_us", "end_us", "duration_us")],
            *(["n_types"] if "event_type" in events.columns else []),
        )
    )


def sessionize_single_node(
    rows: list[tuple],
    gap_us: int,
) -> dict[tuple, tuple[int, int]]:
    """Single-process reference: rows = (entity, t_us, tiebreak);
    returns {(entity, tiebreak): (session_idx, session_seq)}. Used by
    tests only."""
    from collections import defaultdict

    by_ent: dict = defaultdict(list)
    for ent, t_us, tb in rows:
        by_ent[ent].append((t_us, tb))
    out: dict[tuple, tuple[int, int]] = {}
    for ent, evs in by_ent.items():
        evs.sort()
        idx = 0
        seq = 0
        prev = None
        for t_us, tb in evs:
            if prev is None or t_us - prev > gap_us:
                idx += 1
                seq = 0
            seq += 1
            prev = t_us
            out[(ent, tb)] = (idx, seq)
    return out
