"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``connected_components_3d_spark.driver_queries``
(paired Spark plans + DuckDB oracle SQL, with the float-parity rules
documented there). Queries without an oracle entry (``ann_lsh_topk``,
``multimodal_features``) are approximate / binary-payload operators and get
the driver's rows-only check; their exactness is covered by pytest oracles
(tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connected_components_3d_spark import driver_queries as _dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthetic Common-Crawl-style pages → vectorized href
    extraction → CC (block union-find + hash-min) → top-10 components."""
    return _dq.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    return _dq.oracle_sql()
