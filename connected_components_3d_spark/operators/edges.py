"""Edge-table construction & hygiene (SURVEY.md §2.2 O5a–O5f).

The reference's implicit grid-stencil edges become an explicit
``edges(src:long, dst:long)`` DataFrame. Vertex ids are ``xxhash64(url)`` —
stable, deterministic, partition-invariant.

All plain DataFrame ops: Catalyst handles partial aggregation for the
DISTINCTs and broadcast selection for the label join; no UDFs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.extraction import extract_hrefs, extract_text


def pages_with_text(pages: DataFrame) -> DataFrame:
    """Populate the ``text`` column via the vectorized extractor (O4)."""
    return pages.withColumn("text", extract_text(F.col("html")))


def href_edges(pages: DataFrame, keep_urls: bool = False) -> DataFrame:
    """pages → directed href edge table (O4b + O5a/O5b).

    src = xxhash64(url), dst = xxhash64(normalized href); self-loops dropped,
    duplicates dropped (hash agg w/ partial+final under the hood).
    """
    hrefs = pages.select(
        F.col("url"),
        F.explode(extract_hrefs(F.col("html"), F.col("url"))).alias("href"),
    )
    edges = hrefs.select(
        F.xxhash64(F.col("url")).alias("src"),
        F.xxhash64(F.col("href")).alias("dst"),
        *([F.col("url").alias("src_url"), F.col("href").alias("dst_url")] if keep_urls else []),
    )
    return edges.where(F.col("src") != F.col("dst")).distinct()


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view for CC: E ∪ Eᵀ, de-duplicated (O5c)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).distinct()


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """One row per undirected edge with src < dst (triangle/contacts input)."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex table from the edge list (O5d)."""
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """out_deg / in_deg / deg per vertex (O5e). Full outer merge keeps
    sink-only and source-only vertices."""
    out_d = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col("dst").alias("vertex")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "vertex", "full_outer")
        .select(
            "vertex",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg", F.col("out_deg") + F.col("in_deg"))
    )


def filter_edges_by_label(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Multilabel edge filter (O5f): keep edges whose endpoints carry the same
    vertex label — exactly cc3d's multilabel rule (components never merge
    across different input labels, SURVEY.md R1).

    ``labels(vertex, label)`` is typically small relative to edges →
    broadcast both joins.
    """
    lab = F.broadcast(labels.select("vertex", "label"))
    return (
        edges.join(lab.withColumnRenamed("vertex", "src"), "src")
        .withColumnRenamed("label", "src_label")
        .join(lab.withColumnRenamed("vertex", "dst"), "dst")
        .where(F.col("src_label") == F.col("label"))
        .select("src", "dst")
    )
