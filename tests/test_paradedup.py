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


def test_host_scoped_dedup(spark):
    """A per-host footer dies; a line each host carries ONCE survives
    host-scoping (it would die corpus-wide)."""
    from connected_components_3d_spark.operators.paradedup import (
        paragraph_dedup,
    )

    rows = [
        (1, "h1", "own one\nh1 footer\nshared legal line"),
        (2, "h1", "own two\nh1 footer"),
        (3, "h2", "own three\nshared legal line"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, host string, text string")
    scoped = {
        r["doc_id"]: r["text_clean"]
        for r in paragraph_dedup(d, scope_col="host").docs.collect()
    }
    assert scoped[1] == "own one\nshared legal line"
    assert scoped[2] == "own two"
    assert scoped[3] == "own three\nshared legal line"
    corpus = {
        r["doc_id"]: r["text_clean"]
        for r in paragraph_dedup(d).docs.collect()
    }
    assert corpus[1] == "own one"  # legal line dies corpus-wide
