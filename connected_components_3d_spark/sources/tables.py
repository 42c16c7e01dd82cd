"""Readers for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown and
column pruning reach the scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views (mirrors the duckdb oracle
    environment, so ``spark.sql(oracle-ish SQL)`` works for debugging)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def save_bucketed(
    df, table: str, num_buckets: int = 32, key: str = "src"
) -> None:
    """Bucketed + sorted table write — the PERSISTED co-location layout for
    tables joined/aggregated repeatedly on ``key`` (SURVEY.md O14). Readers
    joining or grouping on the bucket key consume the pre-distributed,
    pre-sorted buckets and skip the exchange (and often the sort) entirely —
    the on-disk analogue of the kernels' in-memory
    repartition+sortWithinPartitions+persist layout, and the layout a 100 TB
    edge table would live in between runs (bucket count sized to cluster
    cores there). Plan-audited in tests/test_plans.py."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
