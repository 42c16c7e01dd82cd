"""Host feature vectors (operators/hostfeatures.py): hand-computed
aggregates, dup fraction, single-page stddev NULL, wordless pages,
host isolation."""

from __future__ import annotations

import math

from connected_components_3d_spark.operators.hostfeatures import (
    host_features,
)


def pages_df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def feat_map(res):
    return {r["host"]: r.asDict() for r in res.features.collect()}


def test_hand_computed_features(spark):
    rows = [
        ("https://a.example.com/1", "aa bb"),  # len 5, 2 words, 4 wchars
        ("https://a.example.com/2", "aa bb"),  # dup
        ("https://a.example.com/3", "cccc"),  # len 4, 1 word, 4 wchars
    ]
    got = feat_map(host_features(pages_df(spark, rows)))["a.example.com"]
    assert got["n_pages"] == 3
    assert math.isclose(got["dup_frac"], 1 - 2 / 3, abs_tol=1e-12)
    assert math.isclose(got["avg_len"], (5 + 5 + 4) / 3, abs_tol=1e-12)
    # sample stddev of [5, 5, 4]
    mean = 14 / 3
    var = (2 * (5 - mean) ** 2 + (4 - mean) ** 2) / 2
    assert math.isclose(got["sd_len"], math.sqrt(var), abs_tol=1e-12)
    assert math.isclose(got["avg_words"], (2 + 2 + 1) / 3, abs_tol=1e-12)
    assert math.isclose(got["avg_word_len"], 12 / 5, abs_tol=1e-12)


def test_single_page_and_wordless(spark):
    rows = [
        ("https://b.example.com/only", "hello"),
        ("https://c.example.com/blank", "   "),
    ]
    got = feat_map(host_features(pages_df(spark, rows)))
    assert got["b.example.com"]["sd_len"] is None
    assert got["b.example.com"]["dup_frac"] == 0.0
    assert got["c.example.com"]["avg_words"] == 0.0
    assert got["c.example.com"]["avg_word_len"] == 0.0


def test_hosts_isolated(spark):
    rows = [
        ("https://d1.example.com/x", "one two"),
        ("https://d2.example.com/x", "one two three four"),
    ]
    got = feat_map(host_features(pages_df(spark, rows)))
    assert got["d1.example.com"]["avg_words"] == 2.0
    assert got["d2.example.com"]["avg_words"] == 4.0
