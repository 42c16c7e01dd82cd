from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.anchor import (
    anchor_summary,
    anchor_term_profile,
    anchor_term_profile_single_node,
)

ROWS = [
    # (src, dst, anchor)
    (1, 100, "Best Spark guide"),
    (2, 100, "spark guide spark guide spark"),  # repeats count once per src
    (3, 100, "the SPARK! guide."),
    (4, 100, "fast joins"),
    (1, 200, "fast fast fast"),
    (5, 200, "slow"),
    (6, 300, ""),  # empty anchor: no terms, still an inlink
]


def _edges(spark, rows=ROWS):
    return spark.createDataFrame(rows, "src long, dst long, anchor string")


def test_profile_matches_single_node(spark):
    got = {
        (r["dst"], r["term"]): (r["n"], r["rank"])
        for r in anchor_term_profile(_edges(spark), k=3).collect()
    }
    want = {}
    for dst, lst in anchor_term_profile_single_node(
        [(s, d, a) for s, d, a in ROWS], k=3
    ).items():
        for term, n, rank in lst:
            want[(dst, term)] = (n, rank)
    assert got == want


def test_term_counted_once_per_source(spark):
    prof = {
        r["term"]: r["n"]
        for r in anchor_term_profile(_edges(spark), k=10).collect()
        if r["dst"] == 100
    }
    # 'spark' appears in 3 sources (src 1,2,3) despite src 2 repeating it 3x
    assert prof["spark"] == 3
    assert prof["guide"] == 3
    assert prof["best"] == 1


def test_topk_rank_deterministic_ties(spark):
    rows = [(1, 9, "b a"), (2, 9, "a b"), (3, 9, "c")]
    got = sorted(
        (r["rank"], r["term"], r["n"])
        for r in anchor_term_profile(_edges(spark, rows), k=2).collect()
    )
    # a and b tie at n=2; tie broken by term asc, c (n=1) cut by k=2
    assert got == [(1, "a", 2), (2, "b", 2)]


def test_summary(spark):
    got = {
        r["dst"]: (r["inlinks"], r["sources"], r["terms"])
        for r in anchor_summary(_edges(spark)).collect()
    }
    # vocab(100) = {best, spark, guide, the, fast, joins} = 6
    assert got[100] == (4, 4, 6)
    assert got[200] == (2, 2, 2)  # {fast, slow}
    assert got[300] == (1, 1, 0)  # empty anchor still an inlink


def test_summary_vocab_count(spark):
    got = {
        r["dst"]: r["terms"] for r in anchor_summary(_edges(spark)).collect()
    }
    assert got[100] == 6


def test_duplicate_edge_rows_inflate_inlinks_not_terms(spark):
    rows = [(1, 5, "x y"), (1, 5, "x y")]
    r = anchor_summary(_edges(spark, rows)).collect()[0]
    assert (r["inlinks"], r["sources"], r["terms"]) == (2, 1, 2)
    prof = {
        p["term"]: p["n"]
        for p in anchor_term_profile(_edges(spark, rows), k=5).collect()
    }
    assert prof == {"x": 1, "y": 1}


def test_k_validation(spark):
    with pytest.raises(ValueError):
        anchor_term_profile(_edges(spark), k=0)


def test_empty_input(spark):
    e = _edges(spark, []).limit(0)
    assert anchor_term_profile(e).count() == 0
    assert anchor_summary(e).count() == 0
