"""Exact similarity-join parity vs brute-force all-pairs, prefix-filter
completeness AND actual pruning, threshold-boundary exactness."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.ssjoin import (
    prefix_candidates,
    similarity_join,
    similarity_join_single_node,
)

VOCAB = [f"w{i:03d}" for i in range(400)]


def make_docs(n=60, seed=9):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        base = rng.sample(VOCAB, rng.randint(8, 30))
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:  # planted near-duplicate
            mut = list(base)
            for _ in range(rng.randint(0, 3)):
                mut[rng.randrange(len(mut))] = rng.choice(VOCAB)
            docs.append((1000 + i, " ".join(mut)))
    return docs


def docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def assert_ssjoin_matches(spark, docs, threshold):
    expected = similarity_join_single_node(docs, threshold)
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in similarity_join(
            docs_df(spark, docs), threshold=threshold
        ).collect()
    )
    assert got == expected
    return got


def test_parity_random_docs(spark):
    docs = make_docs()
    for t in ("0.5", "0.8"):
        res = assert_ssjoin_matches(spark, docs, t)
    assert len(res) >= 3  # planted near-dups survive at 0.8


def test_prefix_filter_complete_and_pruning(spark):
    docs = make_docs(n=50, seed=4)
    df = docs_df(spark, docs)
    cand = {
        (r["id_a"], r["id_b"])
        for r in prefix_candidates(df, threshold="0.8").collect()
    }
    truth = {
        (a, b) for a, b, _ in similarity_join_single_node(docs, "0.8")
    }
    assert truth <= cand  # completeness: no qualifying pair missed
    n_docs = df.count()
    assert len(cand) < n_docs * (n_docs - 1) // 2  # real pruning


def test_threshold_boundary_exact(spark):
    # |A|=21, |B|=20, inter=19 -> union 22, J=19/22 < 0.95
    # |A|=20, |B|=20, inter=19 -> union 21, J=19/21 < 0.95
    # equal sets -> J=1; one-token-extra: inter=19, union=20 -> J=0.95 EXACTLY
    a = " ".join(f"t{i}" for i in range(19)) + " onlya"
    b = " ".join(f"t{i}" for i in range(19))  # subset, sizes 20/19
    docs = [(1, a), (2, b)]
    # J = 19/20 = 0.95 exactly: must be INCLUDED at threshold 0.95
    got = assert_ssjoin_matches(spark, docs, "0.95")
    assert got == [(1, 2, 0.95)]
    # and excluded at any strictly higher threshold
    assert assert_ssjoin_matches(spark, docs, "0.96") == []


def test_identical_and_disjoint(spark):
    docs = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "x y z")]
    got = assert_ssjoin_matches(spark, docs, "0.99")
    assert got == [(1, 2, 1.0)]


def test_bad_threshold_rejected(spark):
    with pytest.raises(ValueError, match="threshold"):
        similarity_join(docs_df(spark, [(1, "a")]), threshold="1.5")
