"""Corpus paragraph dedup (operators/paradedup.py): policy semantics,
order preservation, all-boilerplate docs, validation."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.paradedup import paragraph_dedup

DOCS = [
    (1, "alpha one\nSHARED FOOTER\nbeta one"),
    (2, "alpha two\nSHARED FOOTER\nbeta two\nSEMI SHARED"),
    (3, "SHARED FOOTER\nSEMI SHARED"),
    (4, "SHARED FOOTER"),  # all boilerplate → empty after dedup
    (5, "gamma five\n\ngamma tail"),  # empty paragraph ignored
]


def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def collect(res):
    return {
        r["doc_id"]: (r["text_clean"], r["n_paras"], r["n_kept"])
        for r in res.docs.collect()
    }


def test_drop_repeats(spark):
    res = paragraph_dedup(df(spark))
    got = collect(res)
    assert got[1] == ("alpha one\nbeta one", 3, 2)
    assert got[2] == ("alpha two\nbeta two", 4, 2)
    assert got[3] == ("", 2, 0)
    assert got[4] == ("", 1, 0)
    assert got[5] == ("gamma five\ngamma tail", 2, 2)
    assert res.n_paragraphs == 12 and res.n_distinct == 8


def test_max_count_two(spark):
    got = collect(paragraph_dedup(df(spark), max_count=2))
    # SEMI SHARED occurs twice → survives; SHARED FOOTER (4×) still dies
    assert got[2] == ("alpha two\nbeta two\nSEMI SHARED", 4, 3)
    assert got[3] == ("SEMI SHARED", 2, 1)


def test_keep_first(spark):
    got = collect(paragraph_dedup(df(spark), mode="keep_first"))
    # first occurrence of SHARED FOOTER is (doc 1, pos 1); SEMI SHARED at
    # (doc 2, pos 3)
    assert got[1] == ("alpha one\nSHARED FOOTER\nbeta one", 3, 3)
    assert got[2] == ("alpha two\nbeta two\nSEMI SHARED", 4, 3)
    assert got[3] == ("", 2, 0)
    assert got[4] == ("", 1, 0)


def test_validation(spark):
    with pytest.raises(ValueError):
        paragraph_dedup(df(spark), mode="nope")
    with pytest.raises(ValueError):
        paragraph_dedup(df(spark), max_count=0)
