"""Exact distributed heavy hitters — all values whose frequency exceeds
φ·n, with exact counts, WITHOUT a full-cardinality groupBy.

Why not just groupBy().count()? On a 100 TB token/host/URL column the
full aggregation shuffles one key per DISTINCT value (billions); the
answer only needs the ≤ 1/φ values above threshold. The classic 2-pass
scheme keeps the shuffle proportional to the ANSWER, not the vocabulary:

  pass 1 — per-partition Misra–Gries with k = ceil(1/φ) counters
    (mapInPandas, O(k) memory per partition, one dict pass over Arrow
    batches). MG guarantee: any value with partition count > n_p/k
    survives that partition's summary; a value with GLOBAL count > n/k
    must exceed n_p/k in at least one partition (averaging), so the
    union of survivors is a SUPERSET of every true heavy hitter. At
    most P·k candidate rows leave the executors.
  pass 2 — exact recount of candidate rows only: broadcast semi-join
    of the (tiny) candidate set against the column, then a groupBy
    whose key space is ≤ P·k, and the integer threshold filter
    count ≥ floor(φ·n)+1.

The OUTPUT is exact and deterministic — independent of partitioning,
row order, and which extra candidates MG happened to keep — because
pass 2 recounts exactly and the threshold is an integer comparison.
That's what lets a plain GROUP BY/HAVING DuckDB oracle hash-match it
(`heavy_tokens_docs` gate row) even though the intermediate sketch is
order-sensitive.

Python boundary: the MG pass is the one place Python runs, Arrow-batched
with O(k) state; everything else is JVM joins/aggregates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class HeavyHittersResult:
    # (value, cnt) exact counts of every value with cnt >= threshold
    hitters: DataFrame
    n: int
    threshold: int  # floor(phi * n) + 1
    num_candidates: int  # size of the MG candidate union (diagnostics)


def _mg_partition(k: int):
    """Misra–Gries with k counters over Arrow batches of a single string
    column; emits surviving (value,) rows."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf["value"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all; drop zeros (the classic MG step,
                    # amortized O(1) via dict compaction)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({"value": list(counters.keys())})

    return run


def heavy_hitters(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    *,
    phi: float,
) -> HeavyHittersResult:
    """Exact values of ``col`` (cast to string; NULLs ignored) with
    frequency > φ·n, i.e. count ≥ floor(φ·n)+1. φ ∈ (0, 1)."""
    if not 0.0 < phi < 1.0:
        raise ValueError("phi must be in (0, 1)")
    vals = df.select(F.col(col).cast("string").alias("value")).where(
        F.col("value").isNotNull()
    )
    vals = vals.persist()
    n = vals.count()  # scalar; also materializes the cache for pass 1+2
    threshold = int(math.floor(phi * n)) + 1
    if n == 0:
        empty = spark.createDataFrame([], "value string, cnt long")
        return HeavyHittersResult(empty, 0, threshold, 0)

    k = max(1, math.ceil(1.0 / phi))
    cand = (
        vals.mapInPandas(_mg_partition(k), "value string")
        .distinct()
        .persist()
    )
    num_candidates = cand.count()

    hitters = (
        vals.join(F.broadcast(cand), "value")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold)
    )
    return HeavyHittersResult(hitters, n, threshold, num_candidates)
