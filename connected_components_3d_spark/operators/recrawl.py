"""Recrawl scheduling — decide WHICH pages to refetch next from their
observation history, the freshness half of the crawl loop (the fetch
half is operators/frontier.py). Classic Cho–Garcia-Molina framing: each
page changes as a Poisson process; estimate its change rate from past
fetches and prioritize pages whose expected number of missed changes
since the last fetch is highest.

Per URL over its fetch history (ordered by fetch time, with a total
tie-break):
  n_obs      fetches observed
  n_changes  fetches whose content hash differs from the previous one
  span       last_fetch − first_fetch (µs)
  λ̂         (n_changes + s) / (span + 1)   — s smooths the zero-change
             case (a page never seen changing still gets a small rate;
             +1 µs avoids the single-observation div-by-zero)
  age        now − last_fetch (µs)
  priority   λ̂ · age — the expected missed-change count; refetch the
             largest first.

Relational shape: one lag window per URL (URL-keyed, high cardinality —
the natural partition) + one groupBy; everything else is arithmetic on
integers, so the per-row doubles are bit-identical across engines and
the `recrawl_events` gate row hash-matches a plain SQL window replay
with NO rounding.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class RecrawlResult:
    # (url, n_obs, n_changes, span_us, age_us, rate, priority)
    schedule: DataFrame
    now_us: int


def recrawl_priority(
    observations: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "ts_us",
    content_col: str = "content",
    tiebreak_col: str,
    now_us: int | None = None,
    smoothing: float = 0.5,
) -> RecrawlResult:
    """Freshness schedule from (url, fetch-ts µs, content-hash) history.
    ``tiebreak_col`` totalizes the fetch order under equal timestamps.
    ``now_us`` defaults to the max observed timestamp (deterministic)."""
    obs = observations.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.col(content_col).cast("string").alias("content"),
        F.col(tiebreak_col).alias("tb"),
    )
    if now_us is None:
        row = obs.agg(F.max("ts_us").alias("m")).collect()[0]
        if row["m"] is None:
            empty = observations.sparkSession.createDataFrame(
                [],
                "url string, n_obs long, n_changes long, span_us long,"
                " age_us long, rate double, priority double",
            )
            return RecrawlResult(empty, 0)
        now_us = int(row["m"])

    w = Window.partitionBy("url").orderBy("ts_us", "tb")
    lagged = obs.withColumn("prev", F.lag("content").over(w))
    per = lagged.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("content") != F.col("prev")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
        F.max("ts_us").alias("last_us"),
    )
    sched = per.select(
        "url",
        "n_obs",
        F.col("n_changes").cast("long").alias("n_changes"),
        "span_us",
        (F.lit(now_us) - F.col("last_us")).alias("age_us"),
        (
            (F.col("n_changes") + F.lit(float(smoothing)))
            / (F.col("span_us") + F.lit(1))
        ).alias("rate"),
    ).withColumn("priority", F.col("rate") * F.col("age_us"))
    return RecrawlResult(sched, now_us)
