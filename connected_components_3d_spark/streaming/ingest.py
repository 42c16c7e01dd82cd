"""Incremental href-edge ingestion via Structured Streaming.

Pipeline: file-source ``readStream`` over a pages directory → the SAME
pandas-UDF extraction as the batch path (byte-identical text/href semantics
— one extractor, two execution modes) → watermark-deduplicated edge append.

Scale shape: the file source scales by listing (each micro-batch processes
newly arrived files only); extraction is stateless per row; the only stateful
operator is dropDuplicates over (src, dst, warc_ts) bounded by the watermark,
so state size tracks the dedup horizon, not the corpus. Downstream iterative
kernels stay BATCH jobs over edge-table snapshots — iterative fixpoints are
not a streaming-operator shape (SURVEY.md §1.2); this split (streaming
ingest, batch analytics over snapshots) is the standard lakehouse design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.extraction import extract_hrefs

PAGES_SCHEMA = StructType(
    [
        StructField("page_id", LongType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of pages parquet dropped into ``input_dir``."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_edges(pages: DataFrame, dedup_horizon: str = "1 hour") -> DataFrame:
    """Streaming href edges: (src, dst, warc_ts), watermark-deduplicated.

    The watermark bounds dropDuplicates state: an edge re-extracted from a
    page older than the horizon may reappear; the batch kernels' DISTINCT /
    min-agg semantics absorb that (exactly-once is delivered end-to-end by
    sink idempotence, not unbounded state).
    """
    hrefs = pages.select(
        "url",
        "warc_ts",
        F.explode(extract_hrefs(F.col("html"), F.col("url"))).alias("href"),
    )
    edges = hrefs.select(
        F.xxhash64("url").alias("src"),
        F.xxhash64("href").alias("dst"),
        "warc_ts",
    ).where(F.col("src") != F.col("dst"))
    return edges.withWatermark("warc_ts", dedup_horizon).dropDuplicates(
        ["src", "dst", "warc_ts"]
    )


def write_edges_stream(
    edges: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append the streaming edges to a parquet table; availableNow=True
    drains everything currently in the source then stops (the batch-refresh
    mode used in tests and periodic ingest jobs; continuous mode is the same
    call with a processingTime trigger)."""
    writer = (
        edges.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def edge_rate_by_window(
    pages: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked windowed aggregation: crawl-time edge production rate
    (append-mode-safe: windows close once the watermark passes)."""
    hrefs = pages.select(
        "warc_ts", F.explode(extract_hrefs(F.col("html"), F.col("url"))).alias("href")
    )
    return (
        hrefs.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(F.count("*").alias("n_edges"))
        .select(F.col("w.start").alias("window_start"), "n_edges")
    )


# ---------------------------------------------------------------------------
# custom stateful operator: per-host crawl tracking (applyInPandasWithState)
# ---------------------------------------------------------------------------

HOST_STATE_SCHEMA = StructType(
    [
        StructField("pages", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

HOST_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("pages", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("closed", StringType()),  # "open" | "timeout"
    ]
)


def host_crawl_stats(
    pages: DataFrame, idle_timeout_ms: int = 30_000
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-host
    running crawl statistics (page count, first/last crawl timestamp) with
    explicit user-managed state — the shape Structured Streaming cannot
    express with built-in aggs when the per-group update logic is custom
    (here: min/max fold + idle-timeout finalization emitting a "timeout"
    tombstone row and dropping the state).

    State is one 24-byte row per live host, expired after
    ``idle_timeout_ms`` of processing-time inactivity — bounded by active
    hosts, not corpus size. Arrow moves each group's batch in/out; the fold
    itself is numpy on the batch, no per-row Python at the Spark boundary.

    Deployment note: ProcessingTimeTimeout timers keep the trigger loop
    alive, so an ``availableNow`` drain will NOT self-terminate while state
    exists — run this operator under a ``processingTime`` trigger with an
    explicit stop (the test shows the pattern), or use EventTimeTimeout if
    watermark-driven finalization fits the source.
    """
    import pandas as pd

    hosts = pages.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("ts_us"),
    )

    def update(key, pdfs, state):
        host = key[0]
        if state.hasTimedOut:
            pages_n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "pages": [pages_n],
                    "first_us": [first_us],
                    "last_us": [last_us],
                    "closed": ["timeout"],
                }
            )
            return
        n = 0
        lo = None
        hi = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            blo = int(pdf["ts_us"].min())
            bhi = int(pdf["ts_us"].max())
            lo = blo if lo is None else min(lo, blo)
            hi = bhi if hi is None else max(hi, bhi)
        if state.exists:
            p0, f0, l0 = state.get
            n += p0
            lo = f0 if lo is None else min(lo, f0)
            hi = l0 if hi is None else max(hi, l0)
        state.update((n, lo, hi))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "host": [host],
                "pages": [n],
                "first_us": [lo],
                "last_us": [hi],
                "closed": ["open"],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return hosts.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
