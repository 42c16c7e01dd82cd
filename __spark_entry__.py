"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``connected_components_3d_spark.driver_queries``
(paired Spark plans + DuckDB oracle SQL, with the float-parity rules
documented there). The only queries without an oracle entry are the two
approximate-by-construction ANN rows (``ann_lsh_topk``, ``ann_ivf_topk``);
their exactness is gated by the hash-exact degenerate rows
(``ann_lsh_full_cover``, ``ann_ivf_full_probe``) whose pipelines they share,
plus recall-floor pytests.
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
