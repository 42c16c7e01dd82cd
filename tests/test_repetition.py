"""Gopher-style repetition filters (operators/repetition.py)."""

import random

import pytest

from connected_components_3d_spark.operators.repetition import (
    repetition_features,
    repetition_features_single_node,
)

VOCAB = "spark join the of data row scan agg key value".split()


def _df_of(spark, texts):
    return spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )


def _collect(df):
    return {
        r["doc_id"]: {k: r[k] for k in r.asDict() if k != "doc_id"}
        for r in df.collect()
    }


def test_parity_random(spark):
    rng = random.Random(11)
    texts = {
        i: " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(0, 40)))
        for i in range(40)
    }
    got = _collect(repetition_features(_df_of(spark, texts)))
    assert got == repetition_features_single_node(texts)


def test_closed_form_top2(spark):
    # "ab ab ab ab": 2-grams all 'ab_ab' (count 3, mass 4); total mass 8.
    # top_2gram_frac = min(1, 3*4/8) = 1.0; dup_5gram_frac = 0 (no 5-grams).
    got = _collect(
        repetition_features(
            _df_of(spark, {0: "ab ab ab ab"}), top_ns=(2,), dup_ns=(5,)
        )
    )
    assert got == {0: {"top_2gram_frac": 1.0, "dup_5gram_frac": 0.0}}


def test_closed_form_dup(spark):
    # "x y z x y w": 2-gram 'x_y' occurs twice (mass 2 each occurrence);
    # dup mass = 2*2 = 4 over total 6.
    got = _collect(
        repetition_features(
            _df_of(spark, {0: "x y z x y w"}), top_ns=(), dup_ns=(2,)
        )
    )
    assert got == {0: {"dup_2gram_frac": round(4 / 6, 6)}}


def test_tie_prefers_heavier_gram(spark):
    # 'aa_b' and 'c_dd' both occur once... make counts tie at 2 with
    # different masses: doc = "aa b aa b" has 'aa_b' x2 (mass 3), 'b_aa' x1.
    # vs "c dd c dd": 'c_dd' x2 mass 3. Single-doc tie: "q r q r s q r"
    # 2-grams: q_r x3, r_q x2, r_s, s_q. top = q_r (3,2) -> 6/7.
    got = _collect(
        repetition_features(
            _df_of(spark, {0: "q r q r s q r"}), top_ns=(2,), dup_ns=()
        )
    )
    assert got == {0: {"top_2gram_frac": round(6 / 7, 6)}}


def test_short_empty_null_docs(spark):
    df = _df_of(spark, {0: "solo", 1: "", 2: None, 3: "a b"})
    got = _collect(repetition_features(df, top_ns=(2,), dup_ns=(5,)))
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == {"top_2gram_frac": 0.0, "dup_5gram_frac": 0.0}
    assert got[1] == {"top_2gram_frac": 0.0, "dup_5gram_frac": 0.0}
    assert got[2] == {"top_2gram_frac": 0.0, "dup_5gram_frac": 0.0}
    # "a b": one 2-gram count 1 -> top mass 1*2 over total 2 -> 1.0
    assert got[3] == {"top_2gram_frac": 1.0, "dup_5gram_frac": 0.0}


def test_validation(spark):
    df = _df_of(spark, {0: "a b"})
    with pytest.raises(ValueError):
        repetition_features(df, top_ns=(), dup_ns=())
    with pytest.raises(ValueError):
        repetition_features(df, top_ns=(0,), dup_ns=())
