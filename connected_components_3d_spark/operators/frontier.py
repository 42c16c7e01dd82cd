"""Crawl-frontier politeness scheduling — turn a scored URL frontier
into fetchable work: every URL gets (host, shard, rank, wave) such that

  * one SHARD owns a host exclusively (politeness: a single worker
    serializes requests to a host, so per-host rate limits hold even
    with thousands of workers) — deterministic md5 hex-RANGE bucketing
    of the host, the same fixed-width string-compare trick as
    operators/split.py (no hex parsing, engine-portable, stable);
  * within a host, URLs are ranked by (priority DESC, url ASC) — the
    total-order tie-break makes the schedule reproducible;
  * WAVE = (rank−1) // per_host_rate caps how many URLs of one host
    enter each fetch round, so a 10M-page host cannot starve the
    frontier — the crawler drains wave 0 everywhere, then wave 1, …

Scale shape: host extraction is map-side (functions/urls.py string
algebra), the rank is one row_number window per host (high-cardinality
key — the same envelope as any groupBy; hosts ARE the natural crawl
partition), shard/wave are projections. Nothing global, nothing
collected. Gate row `frontier_docs` replays rank/wave with a plain SQL
window and the shard with the identical CASE-over-md5 — hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.urls import url_host
from .split import _HEX_W


def shard_boundaries(num_shards: int) -> list[str]:
    """Ascending hex upper bounds splitting [0, 16^15) into num_shards
    equal ranges; the last bound is 'fff…'."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    out = []
    for i in range(1, num_shards):
        out.append(
            format(int(i / num_shards * (16**_HEX_W)), "x").rjust(_HEX_W, "0")
        )
    out.append("f" * _HEX_W)
    return out


def host_shard(host_col, num_shards: int, *, salt: str = "v1"):
    """Deterministic shard id (0..num_shards−1) for a host column —
    md5 hex-range bucketing compared as strings."""
    h = F.substring(
        F.md5(F.concat(host_col.cast("string"), F.lit(":shard:" + salt))),
        1,
        _HEX_W,
    )
    bounds = shard_boundaries(num_shards)
    expr = None
    for i, b in enumerate(bounds[:-1]):
        cond = h <= F.lit(b)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    last = F.lit(num_shards - 1)
    return (last if expr is None else expr.otherwise(last)).cast("int")


def politeness_schedule(
    df: DataFrame,
    *,
    url_col: str = "url",
    priority_col: str,
    per_host_rate: int,
    num_shards: int,
    salt: str = "v1",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append (host, shard, rank, wave) to the frontier. ``rank`` is
    1-based within host by (priority DESC, url ASC[, tiebreak ASC]);
    ``wave`` is the fetch round the URL becomes eligible in. Pass
    ``tiebreak_col`` (a unique row key) when the frontier may contain
    duplicate URLs — without it, equal (priority, url) rows get an
    engine-dependent order."""
    if per_host_rate < 1:
        raise ValueError("per_host_rate must be >= 1")
    out = df.withColumn("host", url_host(url_col))
    order = [F.col(priority_col).desc(), F.col(url_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy("host").orderBy(*order)
    return (
        out.withColumn("shard", host_shard(F.col("host"), num_shards, salt=salt))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "wave",
            ((F.col("rank") - 1) / per_host_rate).cast("long"),
        )
    )
