"""Mergeable distinct-count rollups — HyperLogLog sketch columns as a
first-class primitive (Datasketches HLL via Spark's ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, the same JVM aggregates the
HyperBall kernel rides — operators/neighborhood.py). The 100 TB pattern
this enables: compute per-(domain, day) sketches ONCE at ingest, persist
the binary column, then answer any coarser rollup (per-domain, per-day,
global) by UNIONING sketches — no rescan of the raw data, and sketch
unions are associative so they co-locate with any partitioning.

Two operators:

  distinct_rollup   df → (keys…, sketch:binary, n_distinct_est:long).
                    Estimates are ROUND()ed to longs; Datasketches HLL is
                    EXACT while a key's sketch is still in sparse/coupon
                    mode (list of distinct hashes, kept until promotion at
                    ~k/4 coupons), so small-cardinality keys report exact
                    counts — the regime the gate row pins against COUNT
                    DISTINCT; beyond that the standard HLL error
                    (~1.04/√2^lgk) applies, pytest-pinned.
  merge_rollup      rollup → coarser keys by hll_union_agg — answer =
                    union of sketches, never a rescan.

Scale shape: one groupBy each with map-side partial sketch merges
(sketch size ≤ 2^lgk registers regardless of input), shuffle =
groups × sketch bytes. No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL sketch + estimate of COUNT(DISTINCT value_col) —
    see module docstring."""
    assert group_cols and 4 <= lgk <= 21
    return (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"))
        .withColumn(
            "n_distinct_est",
            F.round(F.hll_sketch_estimate("sketch")).cast("long"),
        )
    )


def merge_rollup(
    rollup: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Re-aggregate a ``distinct_rollup`` output to coarser keys by
    sketch union (no rescan of the base data)."""
    assert group_cols
    return (
        rollup.groupBy(*group_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn(
            "n_distinct_est",
            F.round(F.hll_sketch_estimate("sketch")).cast("long"),
        )
    )
