"""Text ranking / retrieval primitives over the documents table — TF-IDF
term weighting, Okapi BM25 scoring (Robertson & Spärck Jones; the SPLADE/
BM25 hybrid era's lexical baseline), and inverted-index construction. These
are the retrieval counterpart of the engine's dedup/similarity stack: where
dedup.py asks "which documents repeat", ranking.py asks "which documents
answer a query" — the other half of a webtext corpus pipeline.

Determinism contract (replayed bit-for-bit by the DuckDB gate oracles and
the single-node references):

- tokenisation is the engine-wide ``functions.text.tokens`` contract
  (lowercase, non-alnum runs → space, split, drop '');
- tf = raw term count per (doc, term); df = distinct docs containing term;
  N = corpus size; dl = token count; avgdl = SUM(dl)/N evaluated as one
  exact-integer double division (NOT an incremental mean — engines differ);
- tfidf = ROUND(tf · (ln((1+N)/(1+df)) + 1), 6)  (smooth idf, the
  sklearn convention);
- bm25 per-term contribution  idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  with idf = ln(1 + (N−df+0.5)/(df+0.5)) is ROUNDed to 6 BEFORE the
  per-document sum, and the sum rounded again — addition of a handful of
  rounded terms is then order-insensitive across engines;
- per-doc top-k ties break (score DESC, term ASC); retrieval ties
  (score DESC, doc_id ASC).

Scale shape: the only wide exchanges are (doc, term) and term keyed
aggregates — both map-side combinable; term stats join back to postings by
term (broadcastable while the vocabulary is broadcast-sized, an ordinary
shuffle join beyond); N and avgdl are one scalar collect; the per-doc
top-k window partitions by doc_id (high-cardinality). Nothing quadratic,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term, tf, dl) — one row per distinct term per doc."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    )
    return (
        toks.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf_topk(
    docs: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tfidf, rank) with
    rank 1..k by (tfidf DESC, term ASC). Smooth idf = ln((1+N)/(1+df)) + 1
    so terms present in every document still score > 0 (sklearn's
    TfidfTransformer(smooth_idf=True) convention)."""
    if k < 1:
        raise ValueError(f"tf_idf_topk: k must be >= 1, got {k}")
    post = _postings(docs, text_col, id_col)
    n = docs.count()
    # post is already distinct per (doc, term), so df = COUNT(*)
    df_t = post.groupBy("term").agg(F.count("*").alias("df"))
    scored = post.join(df_t, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf")
            * (F.log((F.lit(1.0) + n) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 scores for every document matching ≥1 query term:
    (doc_id, score). idf = ln(1 + (N−df+0.5)/(df+0.5)); per-term
    contributions rounded to 6 before the sum (see module contract)."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("bm25_scores: query_terms must be distinct")
    post = _postings(docs, text_col, id_col)
    n = docs.count()
    row = (
        docs.select(tokens(text_col).alias("t"))
        .agg(F.sum(F.size("t")).cast("double").alias("s"))
        .first()
    )
    avgdl = (row["s"] or 0.0) / n if n else 0.0
    qp = post.where(F.col("term").isin(list(query_terms)))
    df_t = qp.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = F.round(
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        ),
        6,
    )
    return (
        qp.join(F.broadcast(df_t), "term")
        .select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k retrieval: (doc_id, score, rank), ties (score DESC, doc_id
    ASC). One global top-k — a rank-k ORDER BY LIMIT, which Spark executes
    as per-partition partial top-k + single-reduce merge (TakeOrdered), not
    a full sort."""
    sc = bm25_scores(
        docs, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col
    )
    return (
        sc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ),
        )
    )


def inverted_index(
    docs: DataFrame,
    *,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted index: (term, df, doc_ids:array<long>, tfs:array<long>)
    with postings sorted by doc_id and tfs aligned. Aligned plain-integer
    arrays (not an array of structs) so engines stringify identically; the
    doc_id-major sort makes the posting list mergeable by a conjunctive
    intersector. min_df prunes hapax noise at scale."""
    if min_df < 1:
        raise ValueError(f"inverted_index: min_df must be >= 1, got {min_df}")
    post = _postings(docs, text_col, id_col)
    agg = post.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sort_array(
            F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
        ).alias("p"),
    )
    return agg.where(F.col("df") >= min_df).select(
        "term",
        "df",
        F.transform("p", lambda s: s["doc_id"]).alias("doc_ids"),
        F.transform("p", lambda s: s["tf"]).alias("tfs"),
    )


def conjunctive_doc_ids(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean AND retrieval: doc_ids containing EVERY query term —
    the posting-intersection primitive, expressed as the relational
    group-by-having form (COUNT(DISTINCT matched term) = |q|)."""
    if not query_terms:
        raise ValueError("conjunctive_doc_ids: query_terms must be non-empty")
    post = _postings(docs, text_col, id_col)
    q = len(set(query_terms))
    return (
        post.where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nq"))
        .where(F.col("nq") == q)
        .select("doc_id")
    )


# ---------------------------------------------------------------------------
# single-node references (pytest oracles)
# ---------------------------------------------------------------------------


def _tok_ref(text: str) -> list[str]:
    import re

    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if w]


def tf_idf_topk_single_node(
    docs: dict[int, str], k: int = 5
) -> list[tuple[int, str, float, int]]:
    import math

    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    for d, text in docs.items():
        toks = _tok_ref(text)
        for w in toks:
            tf[(d, w)] = tf.get((d, w), 0) + 1
        for w in set(toks):
            dfc[w] = dfc.get(w, 0) + 1
    out = []
    for d in sorted(docs):
        rows = [
            (w, round(c * (math.log((1.0 + n) / (1.0 + dfc[w])) + 1.0), 6))
            for (dd, w), c in tf.items()
            if dd == d
        ]
        rows.sort(key=lambda r: (-r[1], r[0]))
        for i, (w, s) in enumerate(rows[:k], 1):
            out.append((d, w, s, i))
    return out


def bm25_scores_single_node(
    docs: dict[int, str],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[int, float]:
    import math

    n = len(docs)
    toks = {d: _tok_ref(t) for d, t in docs.items()}
    avgdl = sum(len(t) for t in toks.values()) / n
    dfc = {
        q: sum(1 for t in toks.values() if q in t) for q in query_terms
    }
    out: dict[int, float] = {}
    for d, t in toks.items():
        s = 0.0
        hit = False
        for q in query_terms:
            tf = t.count(q)
            if tf == 0 or dfc[q] == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - dfc[q] + 0.5) / (dfc[q] + 0.5))
            s += round(
                idf
                * tf
                * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * len(t) / avgdl)),
                6,
            )
        if hit:
            out[d] = round(s, 6)
    return out
