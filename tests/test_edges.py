from __future__ import annotations

from pyspark.sql import functions as F

from connected_components_3d_spark.operators.edges import (
    canonical_undirected,
    degrees,
    filter_edges_by_label,
    href_edges,
    symmetrize,
    vertices,
)
from connected_components_3d_spark.sources.pages import synthetic_pages


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [{"src": int(a), "dst": int(b)} for a, b in pairs]
    ).select(F.col("src").cast("long"), F.col("dst").cast("long"))


def test_href_edges_hygiene(spark):
    pages = synthetic_pages(spark, 200, n_hosts=10)
    e = href_edges(pages)
    rows = e.collect()
    assert len(rows) > 0
    assert len(rows) == e.distinct().count()  # deduped
    assert e.where(F.col("src") == F.col("dst")).count() == 0  # no self loops


def test_symmetrize_and_canonical(spark):
    e = _edges_df(spark, [(1, 2), (2, 1), (2, 3)])
    s = symmetrize(e)
    assert sorted((r.src, r.dst) for r in s.collect()) == [
        (1, 2),
        (2, 1),
        (2, 3),
        (3, 2),
    ]
    c = canonical_undirected(e)
    assert sorted((r.src, r.dst) for r in c.collect()) == [(1, 2), (2, 3)]


def test_vertices_and_degrees(spark):
    e = _edges_df(spark, [(1, 2), (1, 3), (3, 1)])
    assert sorted(r.vertex for r in vertices(e).collect()) == [1, 2, 3]
    d = {r.vertex: (r.out_deg, r.in_deg, r.deg) for r in degrees(e).collect()}
    assert d == {1: (2, 1, 3), 2: (0, 1, 1), 3: (1, 1, 2)}


def test_filter_edges_by_label(spark):
    e = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    labels = spark.createDataFrame(
        [{"vertex": v, "label": l} for v, l in [(1, 10), (2, 10), (3, 20), (4, 20)]]
    )
    kept = filter_edges_by_label(e, labels)
    assert sorted((r.src, r.dst) for r in kept.collect()) == [(1, 2), (3, 4)]
