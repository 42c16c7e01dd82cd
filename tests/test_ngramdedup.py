from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.ngramdedup import (
    dup_ngram_stats,
    dup_ngram_stats_single_node,
    dup_ngrams_topk,
)

BOILER = "subscribe to our newsletter for more updates"
DOCS = {
    0: f"alpha beta gamma {BOILER} delta epsilon",
    1: f"{BOILER} something entirely different here",
    2: "no shared content in this document at all honestly",
    3: "short doc",  # < n tokens -> zeros
    4: "",  # empty -> zeros, frac 0.0
    5: "x y z x y z x y z x y z",  # within-doc repeats only: NOT duplicated
}


def _docs(spark, d=DOCS):
    rows = [(k, v) for k, v in d.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_match_single_node(spark):
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["dup_grams"],
            r["covered_tokens"],
            r["dup_frac"],
        )
        for r in dup_ngram_stats(_docs(spark), n=5).collect()
    }
    want = dup_ngram_stats_single_node(DOCS, n=5)
    assert got == want
    # the boilerplate really was detected
    assert got[0][2] > 0 and got[1][2] > 0


def test_within_doc_repeats_not_cross_doc_duplicates(spark):
    got = {
        r["doc_id"]: r["dup_grams"]
        for r in dup_ngram_stats(_docs(spark), n=3).collect()
    }
    # doc 5 repeats 'x y z' internally but no other doc has it
    assert got[5] == 0


def test_overlap_union_not_sum(spark):
    # two docs share a 7-token run; with n=5 that's 3 duplicated grams per
    # doc but only 7 covered positions (union, not 15)
    d = {
        0: "a b c d e f g",
        1: "zz a b c d e f g yy",
    }
    got = {
        r["doc_id"]: (r["dup_grams"], r["covered_tokens"])
        for r in dup_ngram_stats(_docs(spark, d), n=5).collect()
    }
    assert got[0] == (3, 7)
    assert got[1] == (3, 7)
    want = dup_ngram_stats_single_node(d, n=5)
    assert {k: v[1:3] for k, v in want.items()} == got


def test_short_and_empty_docs_zero(spark):
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["dup_grams"],
            r["covered_tokens"],
            r["dup_frac"],
        )
        for r in dup_ngram_stats(_docs(spark), n=5).collect()
    }
    assert got[3] == (2, 0, 0, 0.0)
    assert got[4] == (0, 0, 0, 0.0)


def test_min_docs_threshold(spark):
    d = {0: "p q r s t", 1: "p q r s t", 2: "p q r s t"}
    both = {
        r["doc_id"]: r["dup_grams"]
        for r in dup_ngram_stats(_docs(spark, d), n=5, min_docs=3).collect()
    }
    assert both == {0: 1, 1: 1, 2: 1}
    four = {
        r["doc_id"]: r["dup_grams"]
        for r in dup_ngram_stats(_docs(spark, d), n=5, min_docs=4).collect()
    }
    assert four == {0: 0, 1: 0, 2: 0}


def test_topk_leaderboard(spark):
    rows = dup_ngrams_topk(_docs(spark), n=5, k=3).collect()
    assert len(rows) >= 1
    grams = [r["gram"] for r in rows]
    assert "subscribe to our newsletter for" in grams
    top = rows[0]
    assert top["docs"] == 2
    # deterministic order: (docs desc, occurrences desc, gram asc)
    keys = [(-r["docs"], -r["occurrences"], r["gram"]) for r in rows]
    assert keys == sorted(keys)


def test_validation(spark):
    with pytest.raises(ValueError):
        dup_ngram_stats(_docs(spark), n=0)
    with pytest.raises(ValueError):
        dup_ngram_stats(_docs(spark), min_docs=1)
    with pytest.raises(ValueError):
        dup_ngrams_topk(_docs(spark), k=0)


# --- span REMOVAL transform ------------------------------------------------


def test_remove_duplicated_ngrams_planted(spark):
    from connected_components_3d_spark.operators.ngramdedup import (
        remove_duplicated_ngrams,
    )

    boiler = "subscribe to our newsletter today please"
    rows = [
        (1, "alpha beta gamma delta " + boiler),
        (2, "epsilon zeta " + boiler),
        (3, "eta theta iota kappa"),
        (4, boiler),  # fully boilerplate
        (5, "tiny doc"),  # shorter than n: untouched
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["total_tokens"], r["covered_tokens"])
        for r in remove_duplicated_ngrams(d, n=4, min_docs=2).collect()
    }
    # the 6 boilerplate tokens vanish wherever they appear
    assert got[1] == ("alpha beta gamma delta", 10, 6)
    assert got[2] == ("epsilon zeta", 8, 6)
    assert got[3] == ("eta theta iota kappa", 4, 0)
    assert got[4] == ("", 6, 6)
    assert got[5] == ("tiny doc", 2, 0)


def test_remove_consistent_with_stats(spark):
    """covered_tokens of the transform equals dup_ngram_stats' coverage."""
    from connected_components_3d_spark.operators.ngramdedup import (
        dup_ngram_stats,
        remove_duplicated_ngrams,
    )

    rows = [
        (i, f"doc {i} start shared middle piece here end {i % 3}")
        for i in range(12)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    st = {
        r["doc_id"]: r["covered_tokens"]
        for r in dup_ngram_stats(d, n=3).collect()
    }
    tr = {
        r["doc_id"]: r["covered_tokens"]
        for r in remove_duplicated_ngrams(d, n=3).collect()
    }
    assert st == tr
