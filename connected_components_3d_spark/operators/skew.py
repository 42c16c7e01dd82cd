"""Salted-key skew mitigation (SURVEY.md O13; mandated [BASELINE.json:6,14]).

AQE's skew-join splitting handles oversized shuffle PARTITIONS, but a single
hot KEY (a web hub with 10^8 in-links) still lands in one reduce task. For
decomposable aggregates (min/sum/count — everything the kernels use) we salt
explicitly: spray the hot key's rows over S sub-keys, partial-aggregate per
(key, salt), then final-aggregate per key. Legal exactly because the aggs are
decomposable; results are bit-identical for any S (property-tested:
salt-invariance, SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (the salting candidates)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > threshold)
        .select(key, "cnt")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: Column,
    final_agg,
    partial_agg,
    num_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation: groupBy(key, salt).partial → groupBy(key).final.

    ``partial_agg`` / ``final_agg`` are functions Column→Column, e.g.
    (F.min, F.min) or (F.sum, F.sum) or (F.count, F.sum) for count.
    The salt is a deterministic hash of the whole row's shuffle-relevant
    columns — NOT random — so re-runs and resumed checkpoints agree.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(num_salts)).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(partial_agg(agg_col).alias("_p"))
    return partial.groupBy(key).agg(final_agg(F.col("_p")).alias("_v"))


def salted_min_join(
    labels: DataFrame,
    edges: DataFrame,
    num_salts: int = 8,
) -> DataFrame:
    """Hash-min neighbor aggregation with an explicit salt on dst.

    Equivalent to  edges ⋈ labels(on src) → groupBy(dst).min(label)  but the
    per-dst reduction happens in two stages so a hub dst spreads over
    ``num_salts`` reduce tasks. Used by the CC loop when the hot-key detector
    fires (min is decomposable → identical results for any num_salts).
    """
    contrib = edges.join(
        labels.withColumnRenamed("vertex", "src"), "src"
    ).select(
        "dst",
        "label",
        F.pmod(F.xxhash64("src"), F.lit(num_salts)).cast("int").alias("_salt"),
    )
    partial = contrib.groupBy("dst", "_salt").agg(F.min("label").alias("_m"))
    return partial.groupBy(F.col("dst").alias("vertex")).agg(
        F.min("_m").alias("nbr_label")
    )
