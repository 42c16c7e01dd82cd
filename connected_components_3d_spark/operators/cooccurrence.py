"""Temporal co-occurrence (co-visitation) graph construction — turn an
event log into a weighted entity-entity graph: two users are linked by the
number of distinct time windows in which BOTH were active. The co-click /
co-visitation graph is the standard collaborative-filtering and
community-seeding structure built from web logs (Amazon item-to-item,
session co-access graphs), and the natural bridge from this engine's
events table into every graph operator above.

Construction: tumbling windows by integer floor division of the event's
epoch microseconds (window_id = epoch_us // (window_s · 10^6) — pure
BIGINT, so Spark and DuckDB agree exactly; events.ts is TIMESTAMP_NTZ and
the session timezone is pinned UTC, making the cast value-preserving).
Distinct (window, user) pairs, then a per-window self-join (user_a <
user_b), then a pair-keyed count.

Hub cap (the cocitation.py / butterfly.py rationale): a window with W
active users emits C(W, 2) pairs — one viral burst window would dominate
both the output and the shuffle. Windows with more than ``max_users``
active users are dropped BEFORE pair generation; burst windows carry no
pairwise signal (everyone co-occurs with everyone), so the cap is a
semantic choice, not just a performance one, and counts are exact on the
capped window set. The driver gate hash-compares a plain-SQL replay
(`cooccurrence_events`).

Scale shape: one distinct, one window-keyed count (the cap), one
self-equi-join on the window id (bounded fan-out by the cap), one
pair-keyed count — all high-cardinality keys, no windows over skewed
partitions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _capped_window_users(
    events: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    window_s: int,
    max_users: int,
) -> DataFrame:
    """Distinct (w:long, u:long) pairs over tumbling windows, with burst
    windows (> max_users distinct entities) dropped."""
    if window_s <= 0:
        raise ValueError(f"cooccurrence: window_s must be > 0, got {window_s}")
    # integer-exact floor division: subtract the remainder first so the
    # double `/` divides an exact multiple (epoch_us < 2^53 — no float
    # boundary wobble for any window_s)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    div = F.lit(int(window_s) * 1_000_000).cast("long")
    wid = ((us - (us % div)) / div).cast("long")
    wu = (
        events.select(
            wid.alias("w"),
            F.col(entity_col).cast("long").alias("u"),
        )
        .distinct()
    )
    ok = (
        wu.groupBy("w")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") <= max_users)
        .select("w")
    )
    return wu.join(ok, "w", "left_semi")


def cooccurrence_graph(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = 3600,
    max_users: int = 64,
) -> DataFrame:
    """Weighted co-occurrence edges (user_a:long < user_b:long,
    n_windows:long) over tumbling ``window_s``-second windows; windows with
    more than ``max_users`` distinct active entities are excluded (module
    docstring cap rationale)."""
    wc = _capped_window_users(
        events,
        entity_col=entity_col,
        ts_col=ts_col,
        window_s=window_s,
        max_users=max_users,
    )
    return (
        wc.alias("a")
        .join(wc.alias("b"), F.col("a.w") == F.col("b.w"))
        .where(F.col("a.u") < F.col("b.u"))
        .groupBy(
            F.col("a.u").alias("user_a"), F.col("b.u").alias("user_b")
        )
        .agg(F.count("*").alias("n_windows"))
    )


def copresence_temporal_edges(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = 3600,
    max_users: int = 64,
) -> DataFrame:
    """BOTH-direction temporal edges (src:long, dst:long, t:long) — one per
    ordered pair of entities sharing a capped window, timestamped with the
    window id. The co-presence temporal graph operators/temporal.py's
    earliest-arrival diffusion runs over (same cap rationale as
    cooccurrence_graph; same scale shape — the self-join fan-out is bounded
    by the cap)."""
    wc = _capped_window_users(
        events,
        entity_col=entity_col,
        ts_col=ts_col,
        window_s=window_s,
        max_users=max_users,
    )
    return (
        wc.alias("a")
        .join(wc.alias("b"), F.col("a.w") == F.col("b.w"))
        .where(F.col("a.u") != F.col("b.u"))
        .select(
            F.col("a.u").alias("src"),
            F.col("b.u").alias("dst"),
            F.col("a.w").alias("t"),
        )
    )


def cooccurrence_single_node(
    rows: list[tuple[int, int]],
    *,
    window_us: int,
    max_users: int = 64,
) -> dict[tuple[int, int], int]:
    """Single-node reference over (epoch_us, user) rows."""
    from collections import defaultdict
    from itertools import combinations

    wins: dict[int, set[int]] = defaultdict(set)
    for us, u in rows:
        wins[us // window_us].add(u)
    out: dict[tuple[int, int], int] = defaultdict(int)
    for users in wins.values():
        if len(users) > max_users:
            continue
        for a, b in combinations(sorted(users), 2):
            out[(a, b)] += 1
    return dict(out)
