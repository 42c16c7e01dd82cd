"""Deduplication for training-data pipelines: exact, MinHash+LSH banding,
SimHash, n-gram Jaccard verification.

All pure-native column expressions + relational joins (no UDFs): the MinHash
uses md5-string minima (identical in Spark and duckdb → real cross-engine
oracles), bands bucket via hash-joins, and the Jaccard verifier is an
explode + count join — every stage partial-aggregates and AQE-coalesces.

Scale shape (100 TB): the LSH band join is the only shuffle that grows with
corpus size; its key space (band_id, band_hash) is high-cardinality by
construction so it hash-partitions evenly — hot buckets only appear when a
band value is genuinely shared by many near-dup docs, which is exactly the
work we must do. Candidate verification joins token sets only for candidate
pairs (semi-join pruned), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import distinct_tokens, shingles


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row work across all cores.

    Small parquet inputs arrive as a single scan partition (one 1.5 MB file =
    one split), which serializes expression-heavy stages like MinHash onto one
    core (measured 32x slowdown at sf0.1). At real scale the scan is already
    wide and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5(text): (text_hash, group_size,
    canonical_id = min doc id). group_size > 1 ⇒ duplicates."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 2,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min over shingles of
    md5(shingle || '#i'). md5-string minima are engine-portable; at real
    scale you'd swap in xxhash64 ints (same plan shape, cheaper compare)."""
    docs = _ensure_parallelism(docs)
    toks = distinct_tokens(text_col)
    sh = F.array_distinct(shingles(toks, shingle_n)) if shingle_n > 1 else toks
    # ONE expression computes all hashes: transform over the hash index keeps
    # a single reference to the tokenize→shingle chain. (Building num_hashes
    # separate array_min columns re-evaluates that chain per hash — Catalyst's
    # CollapseProject inlines common subexpressions, measured 16x slower.)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                sh, lambda s: F.md5(F.concat(s, F.lit("#"), i.cast("string")))
            )
        ),
    )
    return docs.select(F.col(id_col).alias("id"), sig.alias("sig"))


def lsh_bands(
    sigs: DataFrame, band_size: int = 2, num_bands: int | None = None
) -> DataFrame:
    """signature → (id, band_id, band_hash) rows; docs sharing any
    (band_id, band_hash) are candidates.

    Pass ``num_bands`` when the signature width is known: a dynamic
    ``size(sig)`` bound references the sig expression a second time, which
    re-inlines (and re-evaluates) the whole upstream minhash chain."""
    n_bands_expr = (
        F.lit(num_bands - 1)
        if num_bands is not None
        else F.floor(F.size("sig") / band_size).cast("int") - 1
    )
    exploded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_bands_expr),
                lambda b: F.md5(
                    F.array_join(
                        F.slice(F.col("sig"), b * band_size + 1, band_size), "|"
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    return exploded


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b), distinct."""
    bands = lsh_bands(
        minhash_signature(docs, text_col, id_col, num_hashes, shingle_n),
        band_size,
        num_bands=num_hashes // band_size,
    )
    # materialize before the self-join: both join sides reuse one computed
    # band table instead of re-running minhash twice (lazy localCheckpoint —
    # computed at first action)
    bands = bands.select("band_id", "band_hash", "id").localCheckpoint(eager=False)
    a = bands.select("band_id", "band_hash", F.col("id").alias("id_a"))
    b = bands.select("band_id", "band_hash", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate (id_a, id_b) pairs:
    |A∩B| via exploded-shingle equi-join, |A∪B| = |A|+|B|−|A∩B|."""
    docs = _ensure_parallelism(docs)
    toks = distinct_tokens(text_col)
    sh = F.array_distinct(shingles(toks, shingle_n)) if shingle_n > 1 else toks
    sets = docs.select(F.col(id_col).alias("id"), sh.alias("sh"))
    sizes = sets.select("id", F.size("sh").alias("n_sh"))
    ex = sets.select("id", F.explode("sh").alias("s"))
    ex_a = ex.select(F.col("id").alias("id_a"), F.col("s"))
    ex_b = ex.select(F.col("id").alias("id_b"), F.col("s"))
    inter = (
        pairs.join(ex_a, "id_a")
        .join(ex_b, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def near_duplicates_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cand = lsh_candidate_pairs(docs, text_col, id_col, num_hashes, band_size, shingle_n)
    j = ngram_jaccard_pairs(docs, cand, text_col, id_col, shingle_n)
    return j.where(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """(id, simhash:int) — bit j set iff Σ_tokens ±1 ≥ 0, where the ±1 is the
    j-th hex nibble of md5(token) ≥ 8. Engine-portable (substr + IN-list).
    Near-dups have small Hamming distance between simhashes."""
    assert bits <= 32
    docs = _ensure_parallelism(docs)
    toks = distinct_tokens(text_col)
    high = list("89abcdef")

    def _vote_fn(j):
        # pyspark infers lambda arity from the Python signature, so the bit
        # index must be captured by closure, not by a default argument
        return lambda acc, w: acc + F.when(
            F.substring(F.md5(w), j + 1, 1).isin(high), 1
        ).otherwise(-1)

    bit_terms = []
    for j in range(bits):
        vote = F.aggregate(toks, F.lit(0), _vote_fn(j))
        bit_terms.append(F.when(vote >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return docs.select(F.col(id_col).alias("id"), total.cast("long").alias("simhash"))


def near_dup_groups(
    spark,
    docs: DataFrame,
    jaccard_threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """End-to-end near-duplicate GROUPING — the full training-data dedup
    pipeline as one operator: MinHash-LSH candidates → exact n-gram Jaccard
    verify → connected components over the ≥threshold pairs → one group id
    (min doc_id of the equivalence class) per document; singletons keep
    their own id. The CC step means transitively-linked dupes (A≈B≈C with
    A,C never a candidate pair) still land in ONE group — groupBy on a pair
    list can't express that. Scale shape: every stage is the already-bucketed
    LSH/join machinery above plus the O(log d) CC fixpoint on the (tiny)
    dup-pair graph."""
    from .cc import connected_components

    cand = lsh_candidate_pairs(docs, text_col, id_col, num_hashes, band_size, shingle_n)
    jac = ngram_jaccard_pairs(docs, cand, text_col, id_col, shingle_n)
    edges = jac.where(F.col("jaccard") >= jaccard_threshold).select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    comps = connected_components(spark, edges, method="hashmin").components
    return (
        docs.select(F.col(id_col).cast("long").alias("vertex"))
        .join(comps, "vertex", "left")
        .select(
            F.col("vertex").alias(id_col),
            F.coalesce("component", F.col("vertex")).alias("group_id"),
        )
    )
