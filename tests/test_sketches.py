"""Distinct-count sketch rollups (operators/sketches.py): exactness in
the sparse regime, merge ≡ direct coarse rollup, merge ≡ no-rescan union,
HLL error envelope at scale, partition invariance, validation."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.sketches import (
    distinct_rollup,
    merge_rollup,
)


def data_df(spark, n=2000, parts=8):
    M, A = 2147483647, 1103515245
    rows = [
        (
            f"d{i % 4}",
            f"day{(i // 4) % 3}",
            f"url{((i * A + 3) % M) % 500}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "domain string, day string, url string"
    ).repartition(parts)


def test_sparse_regime_exact_and_partition_invariant(spark):
    d1 = data_df(spark, parts=1)
    d16 = data_df(spark, parts=16)
    from pyspark.sql import functions as F

    exact = {
        (r["domain"], r["day"]): r["n"]
        for r in d1.groupBy("domain", "day")
        .agg(F.count_distinct("url").alias("n"))
        .collect()
    }
    for d in (d1, d16):
        got = {
            (r["domain"], r["day"]): r["n_distinct_est"]
            for r in distinct_rollup(d, ["domain", "day"], "url").collect()
        }
        assert got == exact  # sparse-mode HLL is exact at these sizes


def test_merge_equals_direct_rollup(spark):
    d = data_df(spark)
    from pyspark.sql import functions as F

    fine = distinct_rollup(d, ["domain", "day"], "url")
    merged = {
        r["domain"]: r["n_distinct_est"]
        for r in merge_rollup(fine, ["domain"]).collect()
    }
    direct = {
        r["domain"]: r["n_distinct_est"]
        for r in distinct_rollup(d, ["domain"], "url").collect()
    }
    exact = {
        r["domain"]: r["n"]
        for r in d.groupBy("domain")
        .agg(F.count_distinct("url").alias("n"))
        .collect()
    }
    assert merged == direct == exact


def test_error_envelope_beyond_sparse(spark):
    """At 200k distinct values per key the sketch has long promoted out of
    sparse mode; the estimate must sit inside ~5 standard errors."""
    from pyspark.sql import functions as F

    d = spark.range(200_000).select(
        F.lit("k").alias("k"), F.col("id").cast("string").alias("v")
    )
    got = distinct_rollup(d, ["k"], "v", lgk=12).collect()[0][
        "n_distinct_est"
    ]
    assert abs(got - 200_000) / 200_000 < 5 * 1.04 / (2**6)  # lgk=12 → √k=64


def test_validation(spark):
    with pytest.raises(AssertionError):
        distinct_rollup(data_df(spark), [], "url")
    with pytest.raises(AssertionError):
        distinct_rollup(data_df(spark), ["domain"], "url", lgk=2)
