"""Host-level statistical features — the Fetterly/Manasse/Najork signal
family ("Spam, Damn Spam, and Statistics", WebDB 2004): spam hosts are
statistical OUTLIERS in per-host content distributions (machine-generated
pages cluster at near-identical lengths, near-duplicate fractions spike,
word-length means drift). This operator computes the per-host feature
vector; thresholding/outlier scoring is the caller's policy decision.

Contract (the DuckDB gate oracle restates it as one GROUP BY — hash-exact
with ROUND 8 on the float columns): per host (functions/urls.py
``url_host``) over pages (url, text):

  n_pages        COUNT(*)
  dup_frac       1 − COUNT(DISTINCT md5(text)) / n_pages
  avg_len        AVG(length(text))
  sd_len         sample stddev of length(text)  (NULL when n_pages = 1 —
                 both engines' stddev_samp convention)
  avg_words      AVG(#whitespace-separated tokens)
  avg_word_len   Σ non-whitespace chars / Σ tokens (0.0 for wordless hosts)

Scale shape: one host-keyed aggregate with map-side partials (COUNT
DISTINCT md5 is Spark's two-phase distinct-aggregate expansion — still a
host-keyed shuffle); native expressions only, no joins, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host


@dataclass
class HostFeaturesResult:
    # (host, n_pages, dup_frac, avg_len, sd_len, avg_words, avg_word_len)
    features: DataFrame


def host_features(pages: DataFrame) -> HostFeaturesResult:
    """Per-host content statistics over ``pages`` (columns ``url``,
    ``text``) — see module docstring for the exact contract."""
    toks = F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != F.lit(""))
    d = pages.select(
        url_host("url").alias("host"),
        F.length("text").cast("long").alias("len"),
        F.md5("text").alias("fp"),
        F.size(toks).cast("long").alias("n_words"),
        F.length(F.regexp_replace("text", "\\s", ""))
        .cast("long")
        .alias("n_wchars"),
    )
    features = d.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        (
            F.lit(1.0)
            - F.countDistinct("fp").cast("double") / F.count("*")
        ).alias("dup_frac"),
        F.avg("len").alias("avg_len"),
        F.stddev_samp("len").alias("sd_len"),
        F.avg("n_words").alias("avg_words"),
        F.when(F.sum("n_words") > 0, F.sum("n_wchars") / F.sum("n_words"))
        .otherwise(F.lit(0.0))
        .alias("avg_word_len"),
    )
    return HostFeaturesResult(features)
