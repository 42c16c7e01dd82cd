"""Cohort retention — the standard "of the users who first appeared in
period C, how many were still active k periods later" product-analytics
table, computed from the raw event log. Rounds out the engine's event-log
analytics suite (sessionization, transition matrix, funnel, co-occurrence,
temporal reachability).

Semantics: period(e) = epoch_us // (period_s·10⁶) (the cooccurrence.py
integer-exact tumbling window); an entity's cohort is its FIRST active
period; for every (cohort, offset k ≥ 0) the cell counts entities of that
cohort active in period cohort+k (distinct presence, not event counts) and
its retention rate n_active / cohort_size (6dp — the k=0 row is 1.0 by
construction, a built-in self-check). Entities are counted by presence, so
a cohort's curve is non-increasing only in expectation — real logs have
resurrection spikes; no monotonicity is imposed.

Scale shape: one distinct over (entity, period), one entity-keyed MIN (the
cohort map — reused via a broadcast-eligible V-sized join), one pair-keyed
count, one cohort-keyed size join; every key is high-cardinality, no
windows, no Python. The driver gate hash-compares a plain-SQL replay
(`retention_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 86_400,
) -> DataFrame:
    """Retention table (cohort:long, k:long, n_active:long,
    retention:double·6dp) over tumbling ``period_s``-second periods;
    cohort is the period id of the entity's first activity, k the offset
    of the activity period from it."""
    if period_s <= 0:
        raise ValueError(
            f"cohort_retention: period_s must be > 0, got {period_s}"
        )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    div = F.lit(int(period_s) * 1_000_000).cast("long")
    pid = ((us - (us % div)) / div).cast("long")
    ep = (
        events.select(
            F.col(entity_col).cast("long").alias("u"), pid.alias("p")
        )
        .distinct()
    )
    cohorts = ep.groupBy("u").agg(F.min("p").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    cells = (
        ep.join(cohorts, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("k"))
        .agg(F.count("*").alias("n_active"))
    )
    return cells.join(sizes, "cohort").select(
        "cohort",
        "k",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


def cohort_retention_single_node(
    rows: list[tuple[int, int]],
    *,
    period_us: int,
) -> dict[tuple[int, int], tuple[int, float]]:
    """Single-node reference over (entity, epoch_us) rows:
    {(cohort, k): (n_active, retention·6dp)}."""
    from collections import defaultdict

    periods: dict[int, set[int]] = defaultdict(set)
    for u, us in rows:
        periods[u].add(us // period_us)
    cohort = {u: min(ps) for u, ps in periods.items()}
    size: dict[int, int] = defaultdict(int)
    for u in cohort:
        size[cohort[u]] += 1
    cells: dict[tuple[int, int], int] = defaultdict(int)
    for u, ps in periods.items():
        for p in ps:
            cells[(cohort[u], p - cohort[u])] += 1
    return {
        ck: (n, round(n / size[ck[0]], 6)) for ck, n in cells.items()
    }
