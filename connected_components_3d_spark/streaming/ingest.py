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


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages parquet dropped into ``input_dir``."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
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
