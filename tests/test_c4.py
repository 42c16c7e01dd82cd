"""C4-style cleaning parity and semantics (operators/c4.py)."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.c4 import (
    c4_clean,
    c4_features,
    c4_features_single_node,
)

CASES = {
    0: "A good long sentence ends here.\nshort.\nno terminal punct line\n"
    "Another proper sentence right here!",
    1: "Please enable JavaScript to view this page.\nReal content sentence "
    'one here.\nQuoted line with enough words."',
    2: "Lorem ipsum dolor sit amet consectetur.\nFine sentence with words.",
    3: "function f() { return 1; }\nGood sentence one here.\nGood sentence "
    "two here.\nGood sentence three here.",
    4: "One good sentence here.\nTwo good sentences here. And another!\n"
    "Third proper line ends now?",
    5: "",
    6: None,
    7: "   Trimmed line with spaces around it.   \nplain",
    8: "Only two sentences here. Second one now!",
}


def docs_df(spark):
    return spark.createDataFrame(
        list(CASES.items()), "doc_id long, text string"
    )


def test_parity_vs_single_node(spark):
    got = {r["doc_id"]: r.asDict() for r in c4_features(docs_df(spark)).collect()}
    want = c4_features_single_node(CASES)
    assert set(got) == set(want)
    for k in want:
        row = {c: got[k][c] for c in want[k]}
        assert row == want[k], f"doc {k}: {row} != {want[k]}"


def test_rules():
    w = c4_features_single_node(CASES)
    # doc 0: 4 lines; "short." (<3 words) and the punct-free line drop
    assert w[0]["n_lines"] == 4 and w[0]["n_kept"] == 2
    # doc 1: the javascript line drops even though it ends in '.'
    assert w[1]["n_kept"] == 2
    # doc 2: lorem ipsum kills the doc regardless of line quality
    assert w[2]["has_lorem"] and not w[2]["keep_doc"]
    # doc 3: brace kills the doc; the brace line also fails the terminal test
    assert w[3]["has_brace"] and not w[3]["keep_doc"] and w[3]["n_kept"] == 3
    # doc 4: 3 kept lines, 4 sentences -> keeps
    assert w[4]["keep_doc"] and w[4]["n_sentences"] == 4
    # empty/null: one pseudo-line, nothing kept, dropped
    for k in (5, 6):
        assert w[k]["n_lines"] == 1 and w[k]["n_kept"] == 0
        assert not w[k]["keep_doc"]
    # doc 7: kept line is emitted trimmed
    assert w[7]["n_kept"] == 1
    # doc 8: two sentences < min_sentences=3 -> dropped
    assert not w[8]["keep_doc"]


def test_clean_corpus(spark):
    out = c4_clean(docs_df(spark))
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    want = c4_features_single_node(CASES)
    assert set(rows) == {k for k, v in want.items() if v["keep_doc"]}
    assert rows[4] == (
        "One good sentence here.\nTwo good sentences here. And another!\n"
        "Third proper line ends now?"
    )
    # doc 0 has only 2 sentences -> dropped at min_sentences=3, but with
    # the threshold lowered its cleaned text drops exactly the two bad lines
    relaxed = {
        r["doc_id"]: r["text"]
        for r in c4_clean(docs_df(spark), min_sentences=2).collect()
    }
    assert relaxed[0] == (
        "A good long sentence ends here.\nAnother proper sentence right here!"
    )


def test_min_words_threshold(spark):
    df = spark.createDataFrame(
        [(1, "one two.\none two three.\none two three four.")],
        "doc_id long, text string",
    )
    [r] = c4_features(df, min_words=4).collect()
    assert r["n_kept"] == 1
    [r] = c4_features(df, min_words=2).collect()
    assert r["n_kept"] == 3


def test_validation():
    # thresholds are checked before any plan is built, so None is fine
    with pytest.raises(ValueError):
        c4_features(None, min_words=0)
    with pytest.raises(ValueError):
        c4_features(None, min_sentences=-1)
