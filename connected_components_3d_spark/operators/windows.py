"""Hopping (sliding) window aggregation over an event log — the batch
counterpart of the Structured Streaming windowed counts in
streaming/ingest.py, and the standard rate/trend primitive (requests per
host per 15-min window hopping every 5, crawl throughput curves): each
event lands in every window of length ``window`` whose start is a
multiple of ``slide`` covering its timestamp — ⌈window/slide⌉ windows per
event, exactly Spark's ``F.window(ts, window, slide)`` semantics
(tumbling when slide = window).

Implemented WITH ``F.window`` itself (JVM-side window expansion inside
whole-stage codegen — the reason to prefer it over a manual explode); the
DuckDB gate oracle restates the semantics from first principles
(generate_series over the hop offsets + window_start arithmetic on epoch
microseconds), so the gate pins Spark's window-assignment behavior against
an independent formulation, not against itself.

Output: (window_start:timestamp, window_end:timestamp, group…,
n_events:long, n_users:long, sum_value:double-ROUND-8).

Scale shape: one explode-to-⌈window/slide⌉ rows (map-side, bounded small
multiple) + one (window, group)-keyed aggregate with map-side partials.
No joins, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hopping_window_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    group_cols: list[str] = ["event_type"],
    user_col: str = "user_id",
    value_col: str = "value",
    window: str = "15 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Per-(hopping window, group) event counts / distinct users / value
    sums — see module docstring. ``user_col``/``value_col`` name the
    distinct-count and sum inputs (parameterized like ts_col/group_cols,
    so any event-log schema works, not just the fixture's)."""
    w = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
            F.round(F.sum(value_col), 8).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "n_users",
            "sum_value",
        )
    )
