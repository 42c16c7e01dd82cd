from __future__ import annotations

import math

import pytest

from connected_components_3d_spark.operators.corpus import (
    heaps_curve,
    heaps_curve_single_node,
    prefix_scan,
    zipf_alpha,
    zipf_topk,
)

DOCS = [
    (10, "the cat sat on the mat"),
    (11, "the dog sat"),
    (12, "a cat, a DOG, a mat!"),
    (13, ""),
    (14, "zebra the zebra"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_heaps_matches_single_node(spark):
    got = sorted(
        (
            r["doc_id"],
            r["doc_tokens"],
            r["new_terms"],
            r["cum_tokens"],
            r["cum_vocab"],
        )
        for r in heaps_curve(_docs(spark)).collect()
    )
    assert got == heaps_curve_single_node(DOCS)


def test_heaps_empty_doc_keeps_row(spark):
    got = {r["doc_id"]: r["new_terms"] for r in heaps_curve(_docs(spark)).collect()}
    assert got[13] == 0 and 13 in got


def test_prefix_scan_many_partitions(spark):
    # more partitions than rows: empty range buckets must not break offsets
    rows = [(i, i % 3 + 1) for i in range(1, 25)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["cum_v"]
        for r in prefix_scan(
            df,
            order_col="k",
            sum_cols=["v"],
            out_names=["cum_v"],
            num_partitions=64,
        ).collect()
    }
    run = 0
    for k, v in rows:
        run += v
        assert out[k] == run


def test_prefix_scan_validation(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="pair up"):
        prefix_scan(df, order_col="k", sum_cols=["v"], out_names=[])


def test_zipf_topk_order_and_ties(spark):
    rows = [(1, "b b a a c")]
    got = [
        (r["rank"], r["term"], r["freq"])
        for r in zipf_topk(_docs(spark, rows), k=2)
        .orderBy("rank")
        .collect()
    ]
    # a and b tie at 2; term asc breaks the tie; c cut by k
    assert got == [(1, "a", 2), (2, "b", 2)]


def test_zipf_alpha_closed_form(spark):
    # freqs: the=4, a=3, cat=2, sat=2, dog=2, mat=2, zebra=2 (>= f_min=2)
    res = zipf_alpha(_docs(spark), f_min=2).collect()[0]
    freqs = [4, 3, 2, 2, 2, 2, 2]
    want = 1.0 + len(freqs) / sum(math.log(f / 1.5) for f in freqs)
    assert res["n_tail"] == len(freqs)
    assert abs(res["alpha"] - round(want, 8)) < 1e-8


def test_zipf_alpha_empty_tail(spark):
    res = zipf_alpha(_docs(spark, [(1, "x y z")]), f_min=2).collect()[0]
    assert res["n_tail"] == 0 and res["alpha"] == 0.0


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="f_min"):
        zipf_alpha(_docs(spark), f_min=1)
    with pytest.raises(ValueError, match="k must"):
        zipf_topk(_docs(spark), k=0)
