"""Corpus-level statistics: Heaps' law vocabulary growth (via a distributed
prefix scan), Zipf rank-frequency leaderboard, and the Zipf exponent MLE.

These are the corpus-health dashboards of an LLM-data pipeline: vocabulary
growth vs corpus position (Heaps' curve — a sub-linear bend flattening too
early means the crawl is saturating on duplicated boilerplate), the head of
the term distribution (Zipf top-k), and the fitted Zipf exponent (CSN
discrete power-law MLE over term frequencies, the same estimator
operators/degree.py applies to degrees).

The interesting piece at scale is the CUMULATIVE curve: a naive
``SUM(...) OVER (ORDER BY doc_id)`` is a single-partition window — a
one-reducer sort of the whole corpus. ``prefix_scan`` implements the
textbook two-pass distributed scan instead:

  pass 1: range-partition on the order column; per-partition partial sums
          (map-side, one row per partition) collected to the driver —
          ≤ #partitions scalar rows, never data
  pass 2: exclusive per-partition offsets broadcast back (tiny join),
          within-partition running sum via a window PARTITIONED BY the
          range bucket (each window group is one partition's rows, never
          the whole corpus)

so the only global ordering work is the range exchange itself — exactly the
shuffle a distributed sort would pay, with no single-reducer stage. Values
are independent of where the sampled range boundaries land, so the output
is deterministic and hash-stable even though the partitioner samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def prefix_scan(
    df: DataFrame,
    *,
    order_col: str,
    sum_cols: list[str],
    out_names: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive prefix sums of ``sum_cols`` over the global ``order_col``
    ordering (which must be unique), without a single-partition window.
    Returns ``df``'s columns plus one long column per ``out_names`` entry.
    """
    if len(sum_cols) != len(out_names):
        raise ValueError("prefix_scan: sum_cols and out_names must pair up")
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(p, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # pass 1: one partial row per partition; the collect is partition-count
    # sized (scalars), not data-sized. Collecting also populates the cache,
    # pinning _pid for pass 2.
    partials = sorted(
        ranged.groupBy("_pid")
        .agg(
            F.min(order_col).alias("_lo"),
            *[F.sum(c).cast("long").alias(c) for c in sum_cols],
        )
        .collect(),
        key=lambda r: r["_lo"],
    )
    offsets, running = [], {c: 0 for c in sum_cols}
    for r in partials:
        offsets.append([int(r["_pid"])] + [running[c] for c in sum_cols])
        for c in sum_cols:
            running[c] += int(r[c] or 0)
    off_schema = ", ".join(
        ["_pid int"] + [f"_off_{c} long" for c in sum_cols]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged.join(F.broadcast(off_df), "_pid").select(
        *df.columns,
        *[
            (F.sum(c).over(w) + F.col(f"_off_{c}"))
            .cast("long")
            .alias(name)
            for c, name in zip(sum_cols, out_names)
        ],
    )
    return out


def heaps_curve(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law curve: per document (in ``id_col`` order) the number of
    never-seen-before terms it contributes, plus cumulative vocabulary and
    token totals. Output: (doc_id:long, doc_tokens:long, new_terms:long,
    cum_tokens:long, cum_vocab:long)."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(text_col).alias("t"),
    )
    per_doc = toks.select(
        "doc_id", F.size("t").cast("long").alias("doc_tokens")
    )
    # each term is credited to the single document where it first appears
    first = (
        toks.select(
            "doc_id", F.explode(F.array_distinct("t")).alias("term")
        )
        .groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("new_terms"))
    )
    base = per_doc.join(first, "doc_id", "left").select(
        "doc_id",
        "doc_tokens",
        F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
    )
    return prefix_scan(
        base,
        order_col="doc_id",
        sum_cols=["doc_tokens", "new_terms"],
        out_names=["cum_tokens", "cum_vocab"],
    )


def zipf_topk(
    docs: DataFrame,
    *,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The k most frequent terms with their rank under the deterministic
    total order (freq DESC, term ASC). The rank window runs over the
    already-LIMITed k-row frame — single-partition by construction but
    k-sized, never corpus-sized. Output: (rank:long, term, freq:long)."""
    if k < 1:
        raise ValueError("zipf_topk: k must be >= 1")
    freq = (
        docs.select(tokens(text_col).alias("t"))
        .select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "term", "freq"
    )


def zipf_alpha(
    docs: DataFrame,
    *,
    f_min: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Discrete power-law exponent MLE over term FREQUENCIES ≥ ``f_min``
    (Clauset–Shalizi–Newman 2009 eq. 3.7 — same estimator as
    operators/degree.py `powerlaw_alpha`, applied to the term-frequency
    multiset). One row: (f_min:long, n_tail:long, alpha:double); an empty
    tail yields n_tail=0, alpha=0.0."""
    if f_min < 2:
        raise ValueError("zipf_alpha: f_min must be >= 2")
    freq = (
        docs.select(tokens(text_col).alias("t"))
        .select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("f"))
        .where(F.col("f") >= f_min)
    )
    agg = freq.agg(
        F.count("*").alias("n_tail"),
        F.sum(F.log(F.col("f") / (f_min - 0.5))).alias("_lsum"),
    )
    return agg.select(
        F.lit(int(f_min)).cast("long").alias("f_min"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.round(
            F.when(
                (F.col("n_tail") > 0) & (F.col("_lsum") > 0),
                1.0 + F.col("n_tail") / F.col("_lsum"),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("alpha"),
    )


def heaps_curve_single_node(
    rows: list[tuple[int, str]],
) -> list[tuple[int, int, int, int, int]]:
    """Sequential replay for tests: (doc_id, doc_tokens, new_terms,
    cum_tokens, cum_vocab) in doc_id order, same tokenizer semantics."""
    import re

    seen: set[str] = set()
    out = []
    cum_t = cum_v = 0
    for doc_id, text in sorted(rows):
        toks_ = [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
            if w
        ]
        new = {w for w in toks_ if w not in seen}
        seen |= new
        cum_t += len(toks_)
        cum_v += len(new)
        out.append((doc_id, len(toks_), len(new), cum_t, cum_v))
    return out
