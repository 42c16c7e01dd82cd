"""Deterministic corpus mixing — turn per-source epoch weights into an
actual materialized sample: weight 2.3 for a source means every row
appears twice and 30% of rows (chosen by hash, not RNG) appear a third
time. This is the last step of the training-data chain (clean → dedup →
split (operators/split.py) → MIX) and the standard way data recipes
express "upsample Wikipedia 3×, downsample CommonCrawl to 0.6×".

Determinism contract (same trick as operators/split.py): the fractional
copy of row k is included iff
    substr(md5(key ‖ ':mix:' ‖ salt), 1, 15)  ≤  hex(floor(frac·16^15))
— a fixed-width lowercase-hex STRING comparison, identical in Spark and
DuckDB (`corpus_mix_docs` gate row, hash-exact), stable under
repartitioning and appends, and independent per salt. Full copies are
materialized by exploding sequence(0, n_copies−1) into a `copy_idx`
column — map-side only; the operator never shuffles, counts, or calls
an RNG.

``temperature_weights`` converts observed source shares into the
(1/T)-power weights used by multilingual/multi-source recipes
(T=1 → proportional, T→∞ → uniform), normalized so the expected total
row count is preserved — a driver-side dict computation (the weights
table is tiny by definition; the per-row work stays in the executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .split import _HEX_W


def _frac_bound(frac: float) -> str:
    """Upper hex bound such that P(hash ≤ bound) ≈ frac; '' for frac=0."""
    if frac <= 0:
        return ""
    return format(int(frac * (16**_HEX_W)), "x").rjust(_HEX_W, "0")


def mix_corpus(
    df: DataFrame,
    key_col: str,
    weight_by: str,
    weights: dict[str, float],
    *,
    salt: str = "v1",
    default_weight: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize the weighted mixture: each row of group g (column
    ``weight_by``) appears floor(w_g) times plus one more with
    probability frac(w_g), decided by md5(key‖':mix:'‖salt). Rows from
    groups not in ``weights`` get ``default_weight``. Weights must be
    ≥ 0; weight 0 drops the group."""
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mix weights must be >= 0")
    k = F.col(key_col).cast("string")
    h = F.substring(F.md5(F.concat(k, F.lit(":mix:" + salt))), 1, _HEX_W)

    g = F.col(weight_by)
    whole = F.lit(int(default_weight))
    extra = F.lit(_frac_bound(default_weight - int(default_weight)))
    for name, w in weights.items():
        whole = F.when(g == name, int(w)).otherwise(whole)
        extra = F.when(g == name, _frac_bound(w - int(w))).otherwise(extra)
    n_copies = whole + F.when((extra != "") & (h <= extra), 1).otherwise(0)
    return (
        df.withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def temperature_weights(
    counts: dict[str, int], temperature: float
) -> dict[str, float]:
    """(1/T)-power sampling weights from observed group counts,
    normalized so Σ_g w_g·count_g = Σ_g count_g (expected corpus size
    preserved). T=1 → all weights 1; larger T flattens the mixture."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not counts or any(c <= 0 for c in counts.values()):
        raise ValueError("counts must be non-empty and positive")
    total = sum(counts.values())
    shares = {g: c / total for g, c in counts.items()}
    raw = {g: s ** (1.0 / temperature) / s for g, s in shares.items()}
    # normalize expected size: Σ w_g c_g = total
    scale = total / sum(raw[g] * counts[g] for g in counts)
    return {g: raw[g] * scale for g in counts}
