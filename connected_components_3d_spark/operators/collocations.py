"""Bigram collocation mining by pointwise mutual information (Church &
Hanks 1990) — "which word pairs co-occur far more than chance" — the
classic corpus-statistics pass of a webtext pipeline (phrase detection,
tokenizer-merge candidates, word2vec-style phrase pre-joining).

Contract (replayed by the gate oracle and the single-node reference):
tokens are the engine-wide ``functions.text.tokens`` contract; a bigram is
an ADJACENT token pair within one document (no cross-document pairs, no
window); with T = total tokens, B = total bigrams, c(w) unigram counts and
c12 bigram counts,

    pmi = ROUND(ln( (c12 / B) / ((c1 / T) · (c2 / T)) ), 6)

evaluated in exactly that association order in both engines (all counts
exact integers, one ln, one ROUND — the ranking.py float stance). Pairs
are ordered (w1 precedes w2); ``min_count`` prunes rare pairs.

Scale shape: one explode to bigrams + two map-side-combinable counts;
unigram stats join back by w1/w2 — broadcast-sized while the vocabulary
is (the usual case; an ordinary shuffle join beyond); T and B are one
scalar collect. Nothing quadratic, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def pmi_bigrams(
    docs: DataFrame,
    *,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(w1, w2, n:long, pmi:double) for every adjacent ordered bigram with
    n ≥ min_count."""
    if min_count < 1:
        raise ValueError(
            f"pmi_bigrams: min_count must be >= 1, got {min_count}"
        )
    toks = docs.select(tokens(text_col).alias("t"))
    # size(t) < 2 guard: sequence(0, size-2) is DESCENDING for negative
    # bounds and ANSI array indexing then throws on t[0] of an empty array.
    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    totals = toks.agg(
        F.sum(F.size("t")).alias("t_total"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("b_total"),
    ).first()
    t_total = float(totals["t_total"] or 0)
    b_total = float(totals["b_total"] or 0)
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    return (
        big.where(F.col("n") >= min_count)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))), "w2")
        .select(
            "w1",
            "w2",
            "n",
            F.round(
                F.log(
                    (F.col("n") / F.lit(b_total))
                    / (
                        (F.col("c1") / F.lit(t_total))
                        * (F.col("c2") / F.lit(t_total))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


def pmi_bigrams_single_node(
    texts: list[str], min_count: int = 5
) -> dict[tuple[str, str], tuple[int, float]]:
    """{(w1, w2): (n, pmi)} under the module contract."""
    import math
    import re

    def tok(s):
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", s.lower()).split(" ")
            if w
        ]

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    t_total = 0
    b_total = 0
    for s in texts:
        ws = tok(s)
        t_total += len(ws)
        b_total += max(len(ws) - 1, 0)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for (a, b), n in big.items():
        if n < min_count:
            continue
        pmi = math.log(
            (n / b_total) / ((uni[a] / t_total) * (uni[b] / t_total))
        )
        out[(a, b)] = (n, round(pmi, 6))
    return out
