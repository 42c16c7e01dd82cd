"""Deterministic corpus splitting and per-group capping — the two
bookkeeping primitives every training-data pipeline needs between
cleaning (operators/c4.py, pii.py, repetition.py) and tokenization:
carve train/val/test ONCE, reproducibly, with no leakage; and bound any
single host/source's contribution (the "at most K docs per domain"
rule used to stop boilerplate-heavy sites from dominating a corpus).

`split_by_hash` — hash-range assignment, the 100 TB-correct design:
  bucket(row) = md5(key ‖ ':' ‖ salt), compared as a fixed-width
  lowercase-hex STRING against precomputed boundary strings (fraction p
  → hex(floor(p·16^15)) zero-padded to 15). MAP-ONLY: no shuffle, no
  window, no count — each row decides its split alone, so the operator
  costs one projection at any scale and the assignment is stable under
  repartitioning, incremental appends, and engine (the same CASE runs
  verbatim in DuckDB — `corpus_split_docs` gate row, hash-exact).
  Proportions are approximate with O(1/√n) concentration — exact-count
  splitting of a web-scale corpus is a global sort and buys nothing.

  The string comparison is the portability trick: hex→integer parsing
  differs across engines (and 16^15 > 2^53 breaks doubles), but
  same-length lowercase hex compares identically everywhere ('0'-'9' <
  'a'-'f' in ASCII).

`cap_per_group` — keep the top ``n`` rows per group under a
deterministic order (quality DESC, then key ASC as the total
tie-break): one row_number window per group key. The window partitions
by the group (host/source) — high-cardinality keys, the same envelope
as any groupBy; a single pathological group degrades to one partition's
sort, which the quality-order semantics require (can't cap what you
don't rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_W = 15  # 15 hex digits = 60 bits; compared as strings, never parsed


def split_boundaries(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper_hex_bound) in declaration order; the last split
    absorbs rounding up to 'fff…'. Fractions must be > 0 and sum to ~1."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("fractions must be > 0")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    out = []
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        bound = format(int(cum * (16**_HEX_W)), "x").rjust(_HEX_W, "0")
        out.append((name, bound))
    out.append((names[-1], "f" * _HEX_W))
    return out


def split_bucket(
    key: str | Column, fractions: dict[str, float], *, salt: str = "v1"
) -> Column:
    """Column expression assigning each row its split name. Pure map-side;
    usable directly inside select/withColumn."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.substring(
        F.md5(F.concat(k.cast("string"), F.lit(":" + salt))), 1, _HEX_W
    )
    bounds = split_boundaries(fractions)
    expr = None
    # ascending bounds: CASE tests the smallest boundary first
    for name, bound in bounds[:-1]:
        cond = h <= F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(bounds[-1][0])
    return last if expr is None else expr.otherwise(last)


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    *,
    salt: str = "v1",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` with the deterministic hash-range assignment."""
    return df.withColumn(
        split_col, split_bucket(key_col, fractions, salt=salt)
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    *,
    order_col: str,
    tiebreak_col: str,
    descending: bool = True,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the ``n`` best rows per group: rank by (order_col DESC|ASC,
    tiebreak_col ASC) — the tie-break makes the kept set deterministic —
    and filter rank ≤ n. ``rank_col`` optionally retains the rank."""
    if n < 1:
        raise ValueError("n must be >= 1")
    ordc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(
        ordc, F.col(tiebreak_col).asc()
    )
    ranked = df.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= n
    )
    if rank_col:
        return ranked.withColumnRenamed("__rk", rank_col)
    return ranked.drop("__rk")
