"""Corpus-level paragraph deduplication — the CCNet/RefinedWeb cleaning
step the span ANALYSIS (operators/anchor.py dup-ngram stats) measures but
doesn't perform: boilerplate paragraphs (footers, cookie banners, shared
navigation) repeat across thousands of pages; drop them and reassemble
each document, preserving paragraph order.

Two policies:
  * drop_repeats (default): a paragraph survives iff its corpus-wide
    occurrence count ≤ max_count (1 = anything repeated disappears
    everywhere — the CCNet shard-dedup behavior);
  * keep_first: the single FIRST occurrence (min (doc, pos) under a
    caller-supplied total order) survives, later repeats are dropped —
    the variant that preserves one copy of legitimate shared content.

Relational shape: posexplode paragraphs (map-side), one md5-keyed
groupBy for counts (or min-first), a broadcast-friendly semi/anti join
back, and one per-doc reassembly aggregation — order restored by
array_sort over (pos, para) structs, NOT by any window. Paragraph hash
keys are high-cardinality; the hot boilerplate hashes are exactly the
rows the count table keeps small. The `paragraph_dedup_docs` gate row
replays the whole transform in DuckDB (UNNEST WITH ORDINALITY +
string_agg ORDER BY), hash-exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ParagraphDedupResult:
    # (doc: id_col, text_clean, n_paras, n_kept)
    docs: DataFrame
    n_paragraphs: int
    n_distinct: int


def paragraph_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    mode: str = "drop_repeats",
    max_count: int = 1,
    scope_col: str | None = None,
) -> ParagraphDedupResult:
    """Dedup paragraphs of ``text_col`` (split on ``sep``) across the
    whole corpus — or within each ``scope_col`` class when given (the
    per-HOST boilerplate convention: a site's own footer repeats across
    its pages and dies, while a legal notice each site carries once
    survives host-scoping but would die corpus-wide). Empty paragraphs
    never count and never survive. Documents whose paragraphs are all
    dropped keep a row with text_clean = ''. ``n_distinct`` counts
    distinct (scope, paragraph) pairs when scoped."""
    if mode not in ("drop_repeats", "keep_first"):
        raise ValueError(f"paragraph_dedup: unknown mode {mode!r}")
    if max_count < 1:
        raise ValueError("max_count must be >= 1")

    scope = (
        F.col(scope_col).cast("string") if scope_col else F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t"),
        scope.alias("_s"),
    )
    paras = base.select(
        "_id",
        "_s",
        F.posexplode(F.split("_t", sep)).alias("pos", "para"),
    ).where(F.length("para") > 0)
    paras = paras.withColumn("h", F.md5("para"))

    if mode == "drop_repeats":
        counts = paras.groupBy("_s", "h").agg(F.count("*").alias("c"))
        kept = paras.join(
            counts.where(F.col("c") <= max_count).select("_s", "h"),
            ["_s", "h"],
        )
    else:  # keep_first
        firsts = paras.groupBy("_s", "h").agg(
            F.min(F.struct("_id", "pos")).alias("f")
        )
        kept = paras.join(firsts, ["_s", "h"]).where(
            (F.col("_id") == F.col("f._id")) & (F.col("pos") == F.col("f.pos"))
        )

    stats = paras.agg(
        F.count("*").alias("n"),
        F.count_distinct("_s", "h").alias("d"),
    ).collect()[0]

    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    per_doc_total = paras.groupBy("_id").agg(F.count("*").alias("n_paras"))
    docs = (
        base.select("_id")
        .distinct()
        .join(per_doc_total, "_id", "left")
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
    return ParagraphDedupResult(docs, int(stats["n"]), int(stats["d"]))
