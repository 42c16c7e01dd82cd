"""PMI bigram collocations (operators/collocations.py)."""

import math
import random

import pytest

from connected_components_3d_spark.operators.collocations import (
    pmi_bigrams,
    pmi_bigrams_single_node,
)

VOCAB = "new york city hot dog data base spark sql the of a".split()


def _texts(rng, n, lo=4, hi=30):
    return [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(lo, hi)))
        for _ in range(n)
    ]


def _df_of(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_parity_random(spark):
    texts = _texts(random.Random(3), 50)
    got = {
        (r["w1"], r["w2"]): (r["n"], r["pmi"])
        for r in pmi_bigrams(_df_of(spark, texts), min_count=2).collect()
    }
    assert got == pmi_bigrams_single_node(texts, min_count=2)


def test_pmi_closed_form(spark):
    # docs [a,b] [a,b] [b,a,b,a]: T=8, B=1+1+3=5, c(a)=4, c(b)=4.
    texts = ["a b", "a b", "b a b a"]
    got = {
        (r["w1"], r["w2"]): (r["n"], r["pmi"])
        for r in pmi_bigrams(_df_of(spark, texts), min_count=1).collect()
    }
    def pmi(c12, c1, c2, t=8.0, b=5.0):
        return round(math.log((c12 / b) / ((c1 / t) * (c2 / t))), 6)

    assert got == {
        ("a", "b"): (3, pmi(3, 4, 4)),
        ("b", "a"): (2, pmi(2, 4, 4)),
    }


def test_pmi_no_cross_document_pairs(spark):
    # doc boundaries break adjacency: "x" at end of doc 0 and "y" at the
    # start of doc 1 must NOT form a bigram.
    got = pmi_bigrams(
        _df_of(spark, ["a x", "y a x", "y b"]), min_count=1
    ).collect()
    pairs = {(r["w1"], r["w2"]) for r in got}
    assert ("x", "y") not in pairs
    assert ("a", "x") in pairs


def test_pmi_min_count_prunes(spark):
    texts = ["p q", "p q", "p r"]
    got = pmi_bigrams(_df_of(spark, texts), min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in got} == {("p", "q")}


def test_pmi_empty_and_validation(spark):
    df = _df_of(spark, ["", "   "])
    assert pmi_bigrams(df, min_count=1).count() == 0
    with pytest.raises(ValueError):
        pmi_bigrams(df, min_count=0)
