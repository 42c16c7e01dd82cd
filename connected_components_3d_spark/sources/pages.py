"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema per the input hint [BASELINE.json:15]:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``
(plus ``page_id:long`` kept for tests).

Generated entirely with NATIVE column expressions over ``spark.range(n)`` —
no Python UDF, no driver-side data, no RNG object: every value is a pure
function of the row id through ``xxhash64``, so the table is identical under
any partitioning / parallelism (seed fixed, FIXTURES.md §2).

Outlink targets are skewed toward low page indices (u³ transform of a
uniform hash → Zipf-like hub skew) so hub/salting behavior is exercised
realistically (FIXTURES.md §2, SURVEY.md O3/O13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
_EPOCH_2026_01_01 = 1767225600  # 2026-01-01T00:00:00Z


def synthetic_pages(
    spark: SparkSession,
    n: int,
    n_hosts: int = 10,
    max_links: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic pages table of ``n`` rows."""
    df = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    i = F.col("id")

    host = i % n_hosts
    url = F.format_string("https://site%d.example/p/%d", host, i)

    # 1..max_links absolute outlinks, targets = floor(n * u^3), u ~ U[0,1)
    nlinks = (F.pmod(F.xxhash64(i, F.lit(SEED), F.lit("nlinks")), max_links) + 1).cast(
        "int"
    )
    links_html = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), nlinks - 1),
            lambda j: _link_html(i, j, n, n_hosts),
        ),
    )

    html_str = F.format_string(
        "<html><head><title>T%d</title>"
        "<script>var x=%d;</script><style>p{margin:0}</style></head>"
        "<body><p>Body &amp; text for page %d on host %d.</p>"
        '%s<a href="/p/%d#frag">next</a>'
        '<a href="mailto:x@example.com">mail</a></body></html>',
        i,
        F.pmod(F.xxhash64(i, F.lit(SEED), F.lit("jsvar")), 1000),
        i,
        host,
        links_html,
        (i + 1) % n,
    )

    return df.select(
        i.alias("page_id"),
        url.alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2026_01_01) + (i % 86400)).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")), (i % 3).cast("int") + 1
        ).alias("lang"),
    )


def _link_html(i, j, n: int, n_hosts: int):
    u = F.pmod(F.xxhash64(i, j, F.lit(SEED)), 1_000_000) / 1_000_000.0
    tgt = F.floor(F.lit(float(n)) * F.pow(u, F.lit(3.0))).cast("long")
    return F.format_string(
        '<a href="https://site%d.example/p/%d">l</a>', tgt % n_hosts, tgt
    )
