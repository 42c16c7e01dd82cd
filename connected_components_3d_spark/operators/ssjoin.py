"""Exact set-similarity self-join with prefix filtering — the SSJoin /
AllPairs / PPJoin family (Chaudhuri, Ganti, Kaushik ICDE 2006; Bayardo,
Ma, Srikant WWW 2007; Xiao, Wang, Lin, Yu WWW 2008): find ALL document
pairs with token-set Jaccard ≥ t, exactly — the guaranteed-complete
complement to the MinHash-LSH candidate generator (dedup.py), which is
probabilistic and can miss pairs. Training-data dedup at a hard similarity
bar wants this operator.

Prefix-filter principle (Xiao et al. Lemma): order all tokens by ONE global
total order O = (ascending document frequency, then token) — rarest first.
For Jaccard ≥ t, a pair must share at least α = ⌈t/(1+t)·(|A|+|B|)⌉ tokens,
and two sets sharing ≥ α tokens must share one among their first
|·| − α + 1 tokens in O (pigeonhole on the merged order). Combined with the
size bound |B| ≥ t·|A| (so α ≥ ⌈t·|A|⌉ and ≥ ⌈t·|B|⌉), indexing only each
set's PREFIX of length |·| − ⌈t·|·|⌉ + 1 and joining prefix-to-prefix loses
no qualifying pair. Prefixes are the RAREST tokens, so the join keys are
low-frequency by construction — the hot-token skew a naive token join would
hit is filtered out, which is the whole scale story.

Exactness contract: the threshold is handled as an exact fraction
num/den (``Fraction(str(threshold))``), so prefix lengths
(⌈t·n⌉ = (num·n + den − 1) // den), the size filter (den·n_b ≥ num·n_a),
and the final test (den·|A∩B| ≥ num·|A∪B|) are all INTEGER arithmetic —
no float ⌈⌉ off-by-ones (0.95·20 = 19.000000000000004 would ceil to 20 and
silently shrink the prefix), and the driver gate can hash-compare against a
brute-force all-pairs DuckDB replay with the same integer test
(`ssjoin_documents`).

Scale shape: one token-keyed groupBy for document frequency, one per-doc
window (partitioned by the high-cardinality doc id) to rank tokens, a
prefix-to-prefix equi-join on rare tokens, then exact verification of the
candidate pairs only (exploded-token equi-join + count, semi-join pruned) —
never all-pairs. No Python UDFs anywhere.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import distinct_tokens, shingles


def _token_sets(
    docs: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    toks = distinct_tokens(text_col)
    sh = F.array_distinct(shingles(toks, shingle_n)) if shingle_n > 1 else toks
    return docs.select(F.col(id_col).alias("id"), sh.alias("sh"))


def _threshold_fraction(threshold: float | str) -> tuple[int, int]:
    frac = Fraction(str(threshold)).limit_denominator(10**6)
    if not (0 < frac < 1):
        raise ValueError(
            f"similarity_join threshold must be in (0, 1), got {threshold}"
        )
    return frac.numerator, frac.denominator


def prefix_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | str = 0.9,
    shingle_n: int = 1,
) -> DataFrame:
    """(id_a, id_b) candidate pairs from the prefix-to-prefix join — a
    guaranteed superset of all pairs with Jaccard ≥ threshold (module
    docstring lemma), already size-filtered. Exposed separately so tests
    can assert both completeness and actual pruning."""
    num, den = _threshold_fraction(threshold)
    sets = _token_sets(docs, text_col, id_col, shingle_n)
    sizes = sets.select("id", F.size("sh").alias("n"))
    ex = sets.select("id", F.explode("sh").alias("tok"))
    freq = ex.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "tok")
    ranked = (
        ex.join(freq, "tok")
        .select("id", "tok", F.row_number().over(w).alias("rk"))
        .join(sizes, "id")
    )
    # prefix length n - ceil(t*n) + 1; the membership test rk <= n - ceil(
    # num*n/den) + 1 rewrites division-free as num*n <= den*(n - rk + 1)
    # (ceil(x/d) <= k  <=>  x <= d*k) — pure BIGINT, no float ceil
    prefix = ranked.where(
        F.lit(num).cast("long") * F.col("n")
        <= F.lit(den).cast("long") * (F.col("n") - F.col("rk") + F.lit(1))
    ).select("id", "tok", "n")
    pa = prefix.select(
        F.col("id").alias("id_a"), "tok", F.col("n").alias("n_a")
    )
    pb = prefix.select(
        F.col("id").alias("id_b"), "tok", F.col("n").alias("n_b")
    )
    return (
        pa.join(pb, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # size filter: t*n_a <= n_b and t*n_b <= n_a, integer-exact
            & (F.lit(den).cast("long") * F.col("n_b") >= F.lit(num).cast("long") * F.col("n_a"))
            & (F.lit(den).cast("long") * F.col("n_a") >= F.lit(num).cast("long") * F.col("n_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )


def similarity_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | str = 0.9,
    shingle_n: int = 1,
) -> DataFrame:
    """ALL pairs (id_a < id_b) with token-set Jaccard ≥ threshold, exactly:
    prefix-filtered candidates, then exact verification on candidates only.
    Output: (id_a, id_b, jaccard:double rounded to 6dp); the ≥-threshold
    test itself is integer arithmetic on the raw counts."""
    num, den = _threshold_fraction(threshold)
    sets = _token_sets(docs, text_col, id_col, shingle_n)
    sizes = sets.select("id", F.size("sh").alias("n"))
    cand = prefix_candidates(docs, text_col, id_col, threshold, shingle_n)
    ex = sets.select("id", F.explode("sh").alias("tok"))
    inter = (
        cand.join(ex.select(F.col("id").alias("id_a"), "tok"), "id_a")
        .join(ex.select(F.col("id").alias("id_b"), "tok"), ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")),
            "id_b",
        )
        .where(
            F.lit(den).cast("long") * F.col("n_inter")
            >= F.lit(num).cast("long")
            * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def similarity_join_single_node(
    docs: list[tuple[int, str]],
    threshold: float | str = 0.9,
) -> list[tuple[int, int, float]]:
    """Brute-force all-pairs reference with the identical tokenizer
    (lowercase, non-alnum runs split, '' dropped) and integer threshold
    test."""
    import re

    num, den = _threshold_fraction(threshold)
    sets = {
        i: set(t for t in re.sub(r"[^a-z0-9]+", " ", s.lower()).split() if t)
        for i, s in docs
    }
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and den * inter >= num * union:
                out.append((a, b, round(inter / union, 6)))
    return sorted(out)
