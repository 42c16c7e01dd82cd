"""Grouped quantiles — the per-key distribution summary every corpus
report leans on (p50/p90/p99 of document length per source, fetch latency
per host, degree per shard). Two paths sharing one output shape:

  method='exact'   Spark's ``percentile`` aggregate — exact linear-
                   interpolation quantiles (index p·(n−1), the same
                   definition DuckDB's ``quantile_cont`` implements, which
                   is what makes the gate row hash-comparable). Exact
                   quantiles hold per-group value multisets in memory —
                   right for bounded-cardinality value domains or modest
                   groups (the ORACLE path).
  method='approx'  ``percentile_approx`` (Greenwald–Khanna sketch,
                   ``accuracy`` knob) — bounded memory per group
                   regardless of cardinality; the 100 TB path. Rank error
                   ≤ 1/accuracy; pytest pins the error envelope, no SQL
                   oracle (sketch internals are engine-specific).

Output: one row per (group, prob) — long format (…, p:double, q:double),
probs in the given order. One groupBy with map-side partial aggregation
either way; no joins, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float] = [0.5, 0.9, 0.99],
    *,
    method: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` — see module docstring."""
    assert group_cols and probs
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert method in ("exact", "approx")
    parr = F.array(*[F.lit(float(p)) for p in probs])
    if method == "exact":
        qcol = F.percentile(F.col(value_col).cast("double"), parr)
    else:
        qcol = F.percentile_approx(
            F.col(value_col).cast("double"), parr, F.lit(accuracy)
        )
    agg = df.groupBy(*group_cols).agg(qcol.alias("qs"))
    return agg.select(
        *group_cols,
        F.posexplode("qs").alias("i", "q"),
    ).select(
        *group_cols,
        F.element_at(parr, F.col("i") + 1).alias("p"),
        F.col("q"),
    )
