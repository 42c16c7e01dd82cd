"""Anchor-text aggregation — the classic web-link-graph enrichment pass
(Brin & Page 1998 §2.2; Craswell et al. 2001 "Effective site finding using
link anchor information"): for every link target, fold the anchor texts of
its inlinks into a per-target term profile. Search and dedup pipelines use
it because anchor terms describe the TARGET page with text the target
itself may not contain.

Contract (replayed by the gate oracle and the single-node reference):
anchors are tokenized with the engine-wide ``functions.text.tokens``
contract; a term counts AT MOST ONCE PER LINKING SOURCE for a given target
(distinct (src, dst, term) before counting — the standard anti-spam
normalization: one page repeating a word a thousand times in one anchor
counts once). ``anchor_term_profile`` keeps each target's top-``k`` terms
by (count DESC, term ASC) with a dense 1-based ``rank``; ``anchor_summary``
reports per-target inlink / distinct-source / distinct-term counts.

Scale shape: one explode + one distinct (map-side combinable aggregate on
(dst, src, term)) + one count, then a window PARTITIONED BY dst — never a
global window, so the top-k ranking shuffles once on dst and each target's
profile ranks locally. All counts are exact integers; no floats, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def anchor_term_profile(
    edges: DataFrame,
    *,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(dst:long, term, n:long, rank:long) — each target's top-k anchor
    terms, a term counted once per distinct linking source; ties broken by
    term ascending so the ranking is deterministic."""
    if k < 1:
        raise ValueError(f"anchor_term_profile: k must be >= 1, got {k}")
    terms = (
        edges.select(
            F.col(dst_col).cast("long").alias("dst"),
            F.col(src_col).cast("long").alias("src"),
            F.explode(tokens(anchor_col)).alias("term"),
        )
        .distinct()
    )
    counts = terms.groupBy("dst", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("dst", "term", "n", "rank")
    )


def anchor_summary(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(dst:long, inlinks:long, sources:long, terms:long) — raw inlink
    count, distinct linking sources, and distinct anchor vocabulary per
    target. The vocabulary count goes through explode→distinct→count (two
    map-side-combinable aggregates) rather than collect_list so no target
    ever materializes its full term array on one executor; countDistinct is
    the exact (not sketch) form because the gate hashes values."""
    base = edges.select(
        F.col(dst_col).cast("long").alias("dst"),
        F.col(src_col).cast("long").alias("src"),
        tokens(anchor_col).alias("toks"),
    )
    links = base.groupBy("dst").agg(
        F.count("*").alias("inlinks"),
        F.countDistinct("src").alias("sources"),
    )
    vocab = (
        base.select("dst", F.explode("toks").alias("term"))
        .distinct()
        .groupBy("dst")
        .agg(F.count("*").alias("terms"))
    )
    return links.join(vocab, "dst", "left").select(
        "dst",
        "inlinks",
        "sources",
        F.coalesce("terms", F.lit(0)).cast("long").alias("terms"),
    )


def anchor_term_profile_single_node(
    rows: list[tuple[int, int, str]], k: int = 3
) -> dict[int, list[tuple[str, int, int]]]:
    """{dst: [(term, n, rank), ...]} under the module contract.
    ``rows`` are (src, dst, anchor_text)."""
    import re

    def tok(s: str) -> list[str]:
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", s.lower()).split(" ")
            if w
        ]

    seen: set[tuple[int, int, str]] = set()
    for src, dst, text in rows:
        for t in tok(text):
            seen.add((src, dst, t))
    counts: dict[int, dict[str, int]] = {}
    for src, dst, t in seen:
        counts.setdefault(dst, {})[t] = counts.setdefault(dst, {}).get(t, 0) + 1
    out: dict[int, list[tuple[str, int, int]]] = {}
    for dst, cm in counts.items():
        ranked = sorted(cm.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[dst] = [(t, n, i + 1) for i, (t, n) in enumerate(ranked)]
    return out
