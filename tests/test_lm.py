"""Bigram LM perplexity scoring (operators/lm.py)."""

import math
import random

import pytest

from connected_components_3d_spark.operators.lm import (
    lm_perplexity,
    lm_perplexity_single_node,
)

VOCAB = "the of data spark row join key scan value fast".split()


def _df_of(spark, texts):
    return spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )


def _collect(df):
    return {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["perplexity"])
        for r in df.collect()
    }


def test_parity_random(spark):
    rng = random.Random(5)
    texts = {
        i: " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(1, 30)))
        for i in range(40)
    }
    got = _collect(lm_perplexity(_df_of(spark, texts)))
    assert got == lm_perplexity_single_node(texts)


def test_closed_form_single_doc(spark):
    # corpus = "a b a b": T=4, V=2, c(a)=c(b)=2, c(a,b)=2, c(b,a)=1.
    k = 0.5
    texts = {0: "a b a b"}
    p1 = (2 + k) / (4 + k * 2)          # p(a)
    pab = (2 + k) / (2 + k * 2)         # p(b|a)
    pba = (1 + k) / (2 + k * 2)         # p(a|b)
    s = (
        round(math.log(p1) * 1e6)
        + 2 * round(math.log(pab) * 1e6)
        + round(math.log(pba) * 1e6)
    )
    ce = -(s / 1e6) / 4
    got = _collect(lm_perplexity(_df_of(spark, texts), k=k))
    assert got == {0: (4, round(ce, 6), round(math.exp(ce), 6))}


def test_low_perplexity_for_repetitive_doc(spark):
    # a doc that is pure repetition of a corpus-frequent bigram scores a
    # lower perplexity than a doc of corpus-rare transitions
    texts = {i: "x y x y x y x y" for i in range(8)}
    texts[100] = "y y x x y y x x"
    got = _collect(lm_perplexity(_df_of(spark, texts)))
    assert got[0][2] < got[100][2]


def test_separate_corpus_and_oov(spark):
    # model trained on corpus only; doc has an OOV word -> smoothed, finite
    corpus = _df_of(spark, {0: "a b a b a"})
    docs = _df_of(spark, {7: "a z"})
    got = _collect(lm_perplexity(docs, corpus=corpus, k=1.0))
    assert set(got) == {7}
    n, ce, ppl = got[7]
    assert n == 2 and math.isfinite(ce) and ppl > 0
    # hand-check: T=5, V=2, c(a)=3; p(a)=(3+1)/(5+2); p(z|a)=(0+1)/(3+2)
    s = round(math.log(4 / 7) * 1e6) + round(math.log(1 / 5) * 1e6)
    assert ce == round(-(s / 1e6) / 2, 6)


def test_empty_docs_omitted_and_validation(spark):
    df = _df_of(spark, {0: "a b", 1: "", 2: None})
    got = _collect(lm_perplexity(df))
    assert set(got) == {0}
    with pytest.raises(ValueError):
        lm_perplexity(df, k=0.0)
    # fully empty corpus -> empty result, stable schema
    empty = lm_perplexity(_df_of(spark, {0: "", 1: None}))
    assert empty.count() == 0
    assert empty.columns == [
        "doc_id", "n_tokens", "cross_entropy", "perplexity",
    ]
