"""Salting tests (SURVEY.md O13, §5.4): salted two-level aggregation must be
bit-identical to the unsalted plan for ANY salt count (min/sum/count are
decomposable), and the hot-key detector must find the Zipf hubs the
synthetic pages generator plants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from connected_components_3d_spark.operators.edges import href_edges, symmetrize
from connected_components_3d_spark.operators.skew import (
    detect_hot_keys,
    salted_agg,
    salted_min_join,
)
from connected_components_3d_spark.sources.pages import synthetic_pages


@pytest.fixture(scope="module")
def edges(spark):
    return href_edges(synthetic_pages(spark, 800)).localCheckpoint()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("num_salts", [1, 4, 16])
def test_salted_min_agg_invariance(spark, edges, num_salts):
    plain = edges.groupBy("dst").agg(F.min("src").alias("_v"))
    salted = salted_agg(edges, "dst", F.col("src"), F.min, F.min, num_salts)
    assert _rows(salted) == _rows(plain)


@pytest.mark.parametrize("num_salts", [1, 8])
def test_salted_count_agg_invariance(spark, edges, num_salts):
    plain = edges.groupBy("dst").agg(F.count("*").cast("long").alias("_v"))
    # count decomposes as partial count + final sum
    salted = salted_agg(edges, "dst", F.lit(1), F.sum, F.count, num_salts)
    assert _rows(salted.select("dst", F.col("_v").cast("long"))) == _rows(plain)


@pytest.mark.parametrize("num_salts", [1, 8])
def test_salted_min_join_matches_plain_hashmin(spark, edges, num_salts):
    e = symmetrize(edges)
    labels = e.select(F.col("src").alias("vertex")).distinct().select(
        "vertex", (F.col("vertex") % 97).alias("label")
    )
    plain = (
        e.join(labels.withColumnRenamed("vertex", "src"), "src")
        .groupBy(F.col("dst").alias("vertex"))
        .agg(F.min("label").alias("nbr_label"))
    )
    salted = salted_min_join(labels, e, num_salts)
    assert _rows(salted) == _rows(plain)


def test_detect_hot_keys_finds_zipf_hubs(spark, edges):
    """The u³ target skew concentrates in-links on low page indices — the
    detector must surface keys whose counts exceed the threshold, and they
    must be exactly the keys a plain count-filter finds."""
    hot = detect_hot_keys(edges, "dst", threshold=20)
    truth = (
        edges.groupBy("dst")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 20)
    )
    assert _rows(hot) == _rows(truth)
    assert hot.count() > 0, "fixture should contain hub keys above threshold"


def test_cc_salting_on_off_bit_identical(spark, edges):
    """VERDICT r1 #4: the CC kernel's salted neighbor-min path (wired via
    salting=True) must produce bit-identical labels to the unsalted plan on
    the Zipf-skewed href graph — min is decomposable, so the result cannot
    depend on the salt fan-out."""
    from connected_components_3d_spark.operators.cc import connected_components

    base = connected_components(spark, edges, method="hashmin", salting=False)
    salted = connected_components(
        spark, edges, method="hashmin", salting=True, num_salts=8
    )
    assert _rows(salted.components) == _rows(base.components)


def test_pagerank_salting_on_off_close(spark, edges):
    """The salted two-stage contribution sum reassociates double additions —
    ranks must agree with the unsalted plan far inside the 1e-6 parity gate."""
    from connected_components_3d_spark.operators.pagerank import pagerank

    base = {
        r.vertex: r.rank
        for r in pagerank(spark, edges, fixed_iters=5, salting=False).ranks.collect()
    }
    salted = {
        r.vertex: r.rank
        for r in pagerank(
            spark, edges, fixed_iters=5, salting=True, num_salts=8
        ).ranks.collect()
    }
    assert base.keys() == salted.keys()
    assert max(abs(base[v] - salted[v]) for v in base) < 1e-12


def test_lpa_salting_on_off_bit_identical(spark, edges):
    """LPA's salted two-stage histogram count (count → sum) is exactly
    decomposable — labels must be bit-identical with salting on or off."""
    from connected_components_3d_spark.operators.lpa import label_propagation

    base = label_propagation(spark, edges, fixed_iters=3, salting=False)
    salted = label_propagation(
        spark, edges, fixed_iters=3, salting=True, num_salts=8
    )
    assert _rows(salted.labels) == _rows(base.labels)
