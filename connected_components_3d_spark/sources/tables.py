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
