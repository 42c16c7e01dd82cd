"""Cross-document duplicated n-gram span detection — the exact-substring
half of training-data dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": memorized spans repeat VERBATIM across
documents; near-dup MinHash misses them when the surrounding text differs).
Complements operators/dedup.py (whole-doc near-dup) and
operators/repetition.py (WITHIN-doc repetition): this pass finds token
n-grams shared verbatim ACROSS documents and scores each document by how
much of it is such boilerplate.

Contract (replayed by the gate oracle and the single-node reference):
tokens are the engine-wide ``functions.text.tokens`` contract; an n-gram is
``n`` consecutive tokens joined by one space; a gram is DUPLICATED iff it
occurs in ≥ ``min_docs`` DISTINCT documents (within-doc repeats alone don't
qualify — that's repetition.py's job). Per document:

    total_tokens   token count
    dup_grams      gram positions whose gram is duplicated
    covered_tokens distinct token positions covered by ≥1 duplicated gram
                   (overlapping spans union, not sum)
    dup_frac       ROUND(covered_tokens / total_tokens, 6); 0.0 when the
                   doc has no tokens

All counts are exact integers; the single ROUND'd division is the only
float, so the gate hash is bit-stable.

Scale shape: one explode to gram positions (map-side, no shuffle), one
groupBy(gram) distinct-doc count, one shuffle join of positions against the
duplicated-gram set (grams are high-cardinality — never broadcast), then a
position explode + distinct per doc for the coverage union. Intermediate
volume is O(tokens · 1) gram rows and O(dup positions · n) coverage rows —
linear in corpus size, no quadratic pair join anywhere (the reason this
beats pairwise suffix comparison at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def dup_ngram_stats(
    docs: DataFrame,
    *,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id:long, total_tokens:long, dup_grams:long, covered_tokens:long,
    dup_frac:double) — one row per input document (docs shorter than ``n``
    tokens get zeros)."""
    if n < 1:
        raise ValueError(f"dup_ngram_stats: n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(
            f"dup_ngram_stats: min_docs must be >= 2, got {min_docs}"
        )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    )
    # size(t) >= n guard: sequence(0, size-n) is DESCENDING for negative
    # upper bounds and ANSI slice then throws (collocations.py pattern).
    grams = (
        toks.where(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}),"
                    f" i -> struct(i AS pos,"
                    f" array_join(slice(t, i + 1, {n}), ' ') AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.pos", "g.gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    dpos = grams.join(dup, "gram").select("doc_id", "pos")
    dg = dpos.groupBy("doc_id").agg(F.count("*").alias("dup_grams"))
    cov = (
        dpos.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("cp"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered_tokens"))
    )
    tot = toks.select("doc_id", F.size("t").cast("long").alias("total_tokens"))
    return (
        tot.join(dg, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            F.when(F.col("total_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("covered_tokens", F.lit(0))
                    / F.col("total_tokens"),
                    6,
                )
            )
            .alias("dup_frac"),
        )
    )


def dup_ngrams_topk(
    docs: DataFrame,
    *,
    n: int = 5,
    min_docs: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(gram, docs:long, occurrences:long) — the ``k`` most widespread
    duplicated n-grams by (docs DESC, occurrences DESC, gram ASC): the
    boilerplate leaderboard a pipeline operator eyeballs before choosing a
    removal threshold. Deterministic total order, so top-k is hash-stable.
    Single TakeOrderedAndProject after one aggregate — no global window."""
    if k < 1:
        raise ValueError(f"dup_ngrams_topk: k must be >= 1, got {k}")
    if n < 1:
        raise ValueError(f"dup_ngrams_topk: n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(
            f"dup_ngrams_topk: min_docs must be >= 2, got {min_docs}"
        )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    )
    grams = (
        toks.where(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}),"
                    f" i -> array_join(slice(t, i + 1, {n}), ' '))"
                )
            ).alias("gram"),
        )
    )
    agg = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count("*").alias("occurrences"),
    )
    return (
        agg.where(F.col("docs") >= min_docs)
        .orderBy(F.desc("docs"), F.desc("occurrences"), F.asc("gram"))
        .limit(k)
    )


def dup_ngram_stats_single_node(
    texts: dict[int, str], n: int = 5, min_docs: int = 2
) -> dict[int, tuple[int, int, int, float]]:
    """{doc_id: (total_tokens, dup_grams, covered_tokens, dup_frac)} under
    the module contract."""
    import re

    def tok(s: str) -> list[str]:
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", s.lower()).split(" ")
            if w
        ]

    toks = {d: tok(s) for d, s in texts.items()}
    gram_docs: dict[str, set[int]] = {}
    for d, ws in toks.items():
        for i in range(len(ws) - n + 1):
            gram_docs.setdefault(" ".join(ws[i : i + n]), set()).add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out: dict[int, tuple[int, int, int, float]] = {}
    for d, ws in toks.items():
        total = len(ws)
        dg = 0
        covered: set[int] = set()
        for i in range(len(ws) - n + 1):
            if " ".join(ws[i : i + n]) in dup:
                dg += 1
                covered.update(range(i, i + n))
        frac = 0.0 if total == 0 else round(len(covered) / total, 6)
        out[d] = (total, dg, len(covered), frac)
    return out


def remove_duplicated_ngrams(
    docs: DataFrame,
    *,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REMOVAL half of Lee et al. exact-substring dedup: drop every
    token position covered by a cross-document duplicated n-gram (the
    ``dup_ngram_stats`` coverage union) and reassemble the survivors in
    order, single-space joined — the same reassembly contract as
    operators/paradedup.py. Docs shorter than ``n`` tokens pass through
    re-tokenized (whitespace normalized), fully-boilerplate docs come out
    empty.

    Output: (doc_id, text_clean, total_tokens, covered_tokens).

    Scale shape: ``dup_ngram_stats``'s explode/groupBy/join pipeline plus
    one anti-join of token positions against covered positions and one
    per-doc ordered reassembly (collect_list + array_sort inside the doc —
    the paradedup pattern; per-doc state only)."""
    if n < 1:
        raise ValueError(f"remove_duplicated_ngrams: n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(
            f"remove_duplicated_ngrams: min_docs must be >= 2, got {min_docs}"
        )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    ).persist()
    tokpos = toks.select(
        "doc_id", F.posexplode("t").alias("pos", "tok")
    )
    grams = (
        toks.where(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}),"
                    f" i -> struct(i AS pos,"
                    f" array_join(slice(t, i + 1, {n}), ' ') AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.pos", "g.gram")
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = tokpos.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    tot = toks.select(
        "doc_id", F.size("t").cast("long").alias("total_tokens")
    )
    out = (
        tot.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "total_tokens",
            (
                F.col("total_tokens")
                - F.coalesce("n_kept", F.lit(0)).cast("long")
            ).alias("covered_tokens"),
        )
    )
    return out
