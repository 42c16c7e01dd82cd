"""Benchmark decontamination — n-gram overlap of a training corpus against
an evaluation set (GPT-3 appendix C / PaLM / Llama-style test-set leakage
detection: a training document is contaminated iff it shares a verbatim
token n-gram with any benchmark document, and the practical statistic is
how much of the document such collisions cover).

Complements operators/ngramdedup.py (which finds grams duplicated WITHIN
the corpus): here the gram set to match against comes from a SECOND table,
and corpus-internal duplication is irrelevant. Contract (replayed by the
gate oracle and the single-node reference): tokens are the engine-wide
``functions.text.tokens`` contract; an n-gram is ``n`` consecutive tokens
joined by one space; a corpus gram POSITION is a hit iff its gram occurs
anywhere in the benchmark. Per corpus document:

    total_tokens   token count
    hit_grams      gram positions whose gram occurs in the benchmark
    covered_tokens distinct token positions covered by ≥1 hit gram
                   (overlapping spans union, not sum)
    contam_frac    ROUND(covered_tokens / total_tokens, 6); 0.0 for an
                   empty doc
    contaminated   covered_tokens > 0 (the GPT-3 "any collision" rule —
                   thresholded variants filter on contam_frac downstream)

All counts are exact integers; the single ROUND'd division is the only
float, so the gate hash is bit-stable.

Scale shape: the corpus side explodes to gram positions map-side (no
shuffle); the benchmark side reduces to DISTINCT grams. The match is a
LEFT SEMI shuffle join on the gram string — the benchmark gram set at real
scale (every eval suite you care about) is millions of rows, far beyond
broadcast, but dwarfed by the corpus side, and semi-join means no
benchmark payload ever moves with the corpus rows. Coverage union is the
ngramdedup.py position-explode + distinct. Everything is linear in corpus
tokens + benchmark tokens; no pairwise doc×doc work anywhere — the reason
this survives a 100 TB corpus against a fat benchmark battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _gram_positions(docs: DataFrame, n: int, id_col: str, text_col: str):
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    )
    # size(t) >= n guard: sequence(0, size-n) is DESCENDING for negative
    # upper bounds and ANSI slice then throws (ngramdedup.py pattern).
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
    return toks, grams


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc_id:long, total_tokens:long, hit_grams:long, covered_tokens:long,
    contam_frac:double, contaminated:boolean) — one row per ``docs`` row
    (docs shorter than ``n`` tokens can never hit). ``benchmark`` only needs
    its text column (``bench_text_col``, default ``text_col``)."""
    if n < 1:
        raise ValueError(f"contamination_stats: n must be >= 1, got {n}")
    btc = bench_text_col or text_col
    toks, grams = _gram_positions(docs, n, id_col, text_col)
    bench_grams = (
        benchmark.select(tokens(btc).alias("t"))
        .where(F.size("t") >= n)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {n}),"
                    f" i -> array_join(slice(t, i + 1, {n}), ' '))"
                )
            ).alias("gram")
        )
        .distinct()
    )
    hits = grams.join(bench_grams, "gram", "left_semi").select(
        "doc_id", "pos"
    )
    hg = hits.groupBy("doc_id").agg(F.count("*").alias("hit_grams"))
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("cp"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered_tokens"))
    )
    tot = toks.select(
        "doc_id", F.size("t").cast("long").alias("total_tokens")
    )
    return (
        tot.join(hg, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("hit_grams", F.lit(0)).cast("long").alias("hit_grams"),
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
            .alias("contam_frac"),
            (F.coalesce("covered_tokens", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    max_frac: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` minus contaminated rows: drops every document whose
    ``contam_frac`` exceeds ``max_frac`` (default 0.0 = the strict GPT-3
    any-collision rule). Returns ``docs``'s full schema — the removal is a
    LEFT ANTI join on the flagged id set, so non-text payload columns ride
    through untouched."""
    flagged = (
        contamination_stats(
            docs, benchmark, n=n, text_col=text_col, id_col=id_col
        )
        .where(F.col("contam_frac") > max_frac)
        .select("doc_id")
    )
    return docs.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def contamination_stats_single_node(
    texts: dict[int, str], bench_texts: list[str], n: int = 8
) -> dict[int, tuple[int, int, int, float, bool]]:
    """{doc_id: (total_tokens, hit_grams, covered_tokens, contam_frac,
    contaminated)} under the module contract."""
    import re

    def tok(s: str) -> list[str]:
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", s.lower()).split(" ")
            if w
        ]

    bench: set[str] = set()
    for s in bench_texts:
        ws = tok(s)
        for i in range(len(ws) - n + 1):
            bench.add(" ".join(ws[i : i + n]))
    out: dict[int, tuple[int, int, int, float, bool]] = {}
    for d, s in texts.items():
        ws = tok(s)
        total = len(ws)
        hg = 0
        covered: set[int] = set()
        for i in range(len(ws) - n + 1):
            if " ".join(ws[i : i + n]) in bench:
                hg += 1
                covered.update(range(i, i + n))
        frac = 0.0 if total == 0 else round(len(covered) / total, 6)
        out[d] = (total, hg, len(covered), frac, len(covered) > 0)
    return out
