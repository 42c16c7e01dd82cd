"""TF-IDF / BM25 / inverted-index ranking stack (operators/ranking.py)."""

import math
import random

import pytest

from connected_components_3d_spark.operators.ranking import (
    bm25_scores,
    bm25_scores_single_node,
    bm25_topk,
    conjunctive_doc_ids,
    inverted_index,
    tf_idf_topk,
    tf_idf_topk_single_node,
)

VOCAB = "spark join window scan batch table row value filter sort".split()


def _docs(rng, n, lo=5, hi=40):
    return {
        d: " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(lo, hi)))
        for d in range(n)
    }


def _df_of(spark, docs):
    return spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )


def test_tfidf_parity_random(spark):
    docs = _docs(random.Random(7), 40)
    got = sorted(
        tuple(r) for r in tf_idf_topk(_df_of(spark, docs), k=3).collect()
    )
    assert got == sorted(tf_idf_topk_single_node(docs, k=3))


def test_tfidf_closed_form(spark):
    # 'a' in both docs (df=2), 'b' only in doc 0 twice (df=1), N=2
    docs = {0: "a b b", 1: "a a a"}
    got = {
        (r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
        for r in tf_idf_topk(_df_of(spark, docs), k=2).collect()
    }
    idf_a = math.log(3.0 / 3.0) + 1.0  # 1.0
    idf_b = math.log(3.0 / 2.0) + 1.0
    assert got[(0, "b")] == (round(2 * idf_b, 6), 1)
    assert got[(0, "a")] == (round(1 * idf_a, 6), 2)
    assert got[(1, "a")] == (round(3 * idf_a, 6), 1)
    assert (1, "b") not in got


def test_bm25_parity_and_monotonicity(spark):
    docs = _docs(random.Random(11), 60)
    q = ["spark", "join"]
    df = _df_of(spark, docs)
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, q).collect()}
    assert got == bm25_scores_single_node(docs, q)
    # a doc with more query hits and same length scores higher
    docs2 = {0: "spark spark join pad", 1: "spark scan scan pad"}
    g2 = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_df_of(spark, docs2), ["spark"]).collect()
    }
    assert g2[0] > g2[1]


def test_bm25_topk_ties_and_limit(spark):
    # identical docs -> identical scores; ties break doc_id asc
    docs = {0: "spark join", 1: "spark join", 2: "scan"}
    top = bm25_topk(_df_of(spark, docs), ["spark"], k=2).collect()
    assert [(r["doc_id"], r["rank"]) for r in top] == [(0, 1), (1, 2)]


def test_inverted_index_and_conjunctive(spark):
    docs = {0: "a b a", 1: "b c", 2: "a c c"}
    df = _df_of(spark, docs)
    idx = {r["term"]: r for r in inverted_index(df).collect()}
    assert idx["a"]["df"] == 2
    assert idx["a"]["doc_ids"] == [0, 2] and idx["a"]["tfs"] == [2, 1]
    assert idx["c"]["doc_ids"] == [1, 2] and idx["c"]["tfs"] == [1, 2]
    only = inverted_index(df, min_df=2).collect()
    assert sorted(r["term"] for r in only) == ["a", "b", "c"]
    got = sorted(
        r["doc_id"] for r in conjunctive_doc_ids(df, ["a", "c"]).collect()
    )
    assert got == [2]
    got = sorted(
        r["doc_id"] for r in conjunctive_doc_ids(df, ["b"]).collect()
    )
    assert got == [0, 1]


def test_validation(spark):
    df = _df_of(spark, {0: "a"})
    with pytest.raises(ValueError):
        tf_idf_topk(df, k=0)
    with pytest.raises(ValueError):
        bm25_scores(df, [])
    with pytest.raises(ValueError):
        bm25_scores(df, ["a", "a"])
    with pytest.raises(ValueError):
        inverted_index(df, min_df=0)
    with pytest.raises(ValueError):
        conjunctive_doc_ids(df, [])
