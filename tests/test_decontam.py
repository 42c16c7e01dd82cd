from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.decontam import (
    clean_corpus,
    contamination_stats,
    contamination_stats_single_node,
)

QUESTION = "what is the capital of france and when was it founded"
DOCS = {
    0: f"some crawl page saying {QUESTION} plus trailing commentary",
    1: "a perfectly clean document about gardening and soil quality",
    2: f"{QUESTION}",  # the benchmark verbatim -> fully covered
    3: "short doc",  # < n tokens -> zeros
    4: "",  # empty -> zeros, frac 0.0
    5: f"prefix {QUESTION} middle {QUESTION} suffix",  # two hit spans
}
BENCH = [QUESTION, "unrelated benchmark question nobody copied"]


def _docs(spark, d=DOCS):
    rows = [(k, v) for k, v in d.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark, b=BENCH):
    return spark.createDataFrame([(t,) for t in b], "text string")


def test_stats_match_single_node(spark):
    got = {
        r["doc_id"]: (
            r["total_tokens"],
            r["hit_grams"],
            r["covered_tokens"],
            r["contam_frac"],
            r["contaminated"],
        )
        for r in contamination_stats(
            _docs(spark), _bench(spark), n=8
        ).collect()
    }
    want = contamination_stats_single_node(DOCS, BENCH, n=8)
    assert got == want
    # the planted leak really was detected, the clean doc really is clean
    assert got[0][4] and got[2][4] and got[5][4]
    assert not got[1][4] and not got[3][4] and not got[4][4]


def test_verbatim_benchmark_doc_fully_covered(spark):
    got = {
        r["doc_id"]: (r["covered_tokens"], r["contam_frac"])
        for r in contamination_stats(
            _docs(spark), _bench(spark), n=8
        ).collect()
    }
    # doc 2 IS a benchmark row: every token covered, frac exactly 1.0
    assert got[2] == (len(QUESTION.split()), 1.0)


def test_overlapping_spans_union_not_sum(spark):
    # doc 5 embeds the question twice; covered_tokens counts distinct
    # positions (2 * len(question)), never hit_grams * n
    row = {
        r["doc_id"]: r
        for r in contamination_stats(
            _docs(spark), _bench(spark), n=8
        ).collect()
    }[5]
    q = len(QUESTION.split())
    assert row["covered_tokens"] == 2 * q
    assert row["hit_grams"] == 2 * (q - 8 + 1)


def test_corpus_internal_duplication_is_not_contamination(spark):
    # two corpus docs share a phrase absent from the benchmark: no hits
    docs = {
        0: "shared corpus boilerplate phrase appearing in two documents ok",
        1: "shared corpus boilerplate phrase appearing in two documents ok",
    }
    got = contamination_stats(
        _docs(spark, docs), _bench(spark), n=8
    ).collect()
    assert all(r["hit_grams"] == 0 for r in got)


def test_clean_corpus_drops_exactly_the_flagged(spark):
    kept = sorted(
        r["doc_id"]
        for r in clean_corpus(_docs(spark), _bench(spark), n=8).collect()
    )
    assert kept == [1, 3, 4]
    # schema rides through untouched
    cols = clean_corpus(_docs(spark), _bench(spark), n=8).columns
    assert cols == ["doc_id", "text"]


def test_max_frac_threshold(spark):
    # doc 0 has frac < 1.0; a permissive threshold keeps it, strict drops it
    stats = {
        r["doc_id"]: r["contam_frac"]
        for r in contamination_stats(
            _docs(spark), _bench(spark), n=8
        ).collect()
    }
    loose = sorted(
        r["doc_id"]
        for r in clean_corpus(
            _docs(spark), _bench(spark), n=8, max_frac=stats[0]
        ).collect()
    )
    assert 0 in loose and 2 not in loose and 5 not in loose


def test_empty_benchmark_flags_nothing(spark):
    got = contamination_stats(
        _docs(spark), _bench(spark, ["tiny"]), n=8
    ).collect()
    assert all(not r["contaminated"] for r in got)
    assert len(got) == len(DOCS)


def test_n_validation(spark):
    with pytest.raises(ValueError, match="n must be"):
        contamination_stats(_docs(spark), _bench(spark), n=0)
