"""Bigram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020: rank web pages by LM perplexity; Brown et al.
2020 use the same shape for GPT-3's quality classifier): train an add-k
smoothed bigram model on a corpus, score every document by per-token
cross-entropy, keep the low-perplexity tail.

Model (Chen–Goodman additive smoothing, the textbook recurrence):

    p(w_1)          = (c(w_1) + k) / (T + k.V)
    p(w_i | w_i-1)  = (c(w_i-1 w_i) + k) / (c(w_i-1) + k.V)

with c(.) corpus unigram/bigram counts, T total tokens, V vocabulary size.
cross_entropy(doc) = -(1/m) . sum ln p;  perplexity = exp(cross_entropy).

Cross-engine float contract (the gate oracle replays this bit-for-bit):
every per-occurrence ln p is quantized to integer MICRO-NATS
(CAST(ROUND(ln(p) * 1e6) AS BIGINT)) and summed as integers — the per-doc
sum is order-insensitive by construction, unlike a float sum; the only
trailing float work is two divisions, one exp, one ROUND(.,6) per cell.

Scale shape: one explode to (doc, prev, word) occurrence triples grouped
per doc BEFORE any join (occ multiplicity rides as an integer); unigram /
bigram model tables join back on high-cardinality keys (broadcast when
small, ordinary shuffle joins beyond — nothing is collected but the two
scalars T and V); per-doc fold is one groupBy. No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def lm_perplexity(
    docs: DataFrame,
    *,
    k: float = 0.1,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens:long, cross_entropy:double, perplexity:double) for
    every document with >= 1 token (token-free docs have no defined
    per-token entropy and are omitted). Model trained on ``corpus``
    (default: ``docs`` itself — the self-scored corpus convention)."""
    if k <= 0:
        raise ValueError(f"lm_perplexity: smoothing k must be > 0, got {k}")

    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("t"),
        )

    ctoks = _toks(corpus if corpus is not None else docs)
    uni = (
        ctoks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    stats = uni.agg(
        F.sum("c").alias("t_total"), F.count("*").alias("v")
    ).first()
    t_total = int(stats["t_total"] or 0)
    v = int(stats["v"] or 0)
    if v == 0:
        return docs.sparkSession.createDataFrame(
            [],
            "doc_id long, n_tokens long, cross_entropy double,"
            " perplexity double",
        )
    big = (
        ctoks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .groupBy("p.w1", "p.w2")
        .agg(F.count("*").alias("c12"))
    )

    # (doc, prev|NULL, word, occ) occurrence groups: i = 0 contributes the
    # unconditional first-token term (prev NULL), i >= 1 the bigram term.
    pairs = (
        _toks(docs)
        .where(F.size("t") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 1),"
                    " i -> struct(CASE WHEN i = 0 THEN NULL ELSE t[i - 1] END"
                    " AS w1, t[i] AS w2))"
                )
            ).alias("p"),
        )
        .groupBy("doc_id", "p.w1", "p.w2")
        .agg(F.count("*").alias("occ"))
    )

    kv = k * v  # one IEEE multiply, identical in both engines
    scored = (
        pairs.join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2")),
            "w2",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1")),
            "w1",
            "left",
        )
        .join(big, ["w1", "w2"], "left")
        .select(
            "doc_id",
            "occ",
            F.when(
                F.col("w1").isNull(),
                F.log(
                    (F.coalesce("c_w2", F.lit(0)) + F.lit(k))
                    / F.lit(t_total + kv)
                ),
            )
            .otherwise(
                F.log(
                    (F.coalesce("c12", F.lit(0)) + F.lit(k))
                    / (F.coalesce("c_w1", F.lit(0)) + F.lit(kv))
                )
            )
            .alias("lp"),
        )
        # micro-nat quantization BEFORE the per-doc sum: integer summation
        # is order-insensitive, so shuffle/agg order can't move the hash
        .select(
            "doc_id",
            "occ",
            (F.round(F.col("lp") * 1e6, 0).cast("long") * F.col("occ")).alias(
                "lp_int"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("occ").alias("n_tokens"), F.sum("lp_int").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                -(F.col("s") / 1e6) / F.col("n_tokens"), 6
            ).alias("cross_entropy"),
            F.round(
                F.exp(-(F.col("s") / 1e6) / F.col("n_tokens")), 6
            ).alias("perplexity"),
        )
    )


def lm_perplexity_single_node(
    texts: dict[int, str], k: float = 0.1
) -> dict[int, tuple[int, float, float]]:
    """{doc_id: (n_tokens, cross_entropy, perplexity)} under the module
    contract (self-trained)."""
    import math
    import re

    def tok(s):
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", (s or "").lower()).split(" ")
            if w
        ]

    docs = {i: tok(t) for i, t in texts.items()}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ws in docs.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    t_total = sum(uni.values())
    v = len(uni)
    out = {}
    for i, ws in docs.items():
        if not ws:
            continue
        s = 0
        for j, w in enumerate(ws):
            if j == 0:
                p = (uni.get(w, 0) + k) / (t_total + k * v)
            else:
                p = (big.get((ws[j - 1], w), 0) + k) / (
                    uni.get(ws[j - 1], 0) + k * v
                )
            s += round(math.log(p) * 1e6)
        ce = -(s / 1e6) / len(ws)
        out[i] = (len(ws), round(ce, 6), round(math.exp(ce), 6))
    return out
