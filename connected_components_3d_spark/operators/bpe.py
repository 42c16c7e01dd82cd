"""Distributed BPE tokenizer training — byte-pair encoding merges learned
from the corpus word-frequency table (Sennrich, Haddow, Birch, ACL 2016:
"Neural Machine Translation of Rare Words with Subword Units"), the
vocabulary-construction step of every modern LLM data pipeline, run as
Spark aggregates instead of a single-machine counter.

Contract (deterministic — the single-node oracle and the DuckDB
chained-CTE gate oracle replay it bit-for-bit):

  * words are the engine-wide ``functions.text.tokens`` contract; BPE
    state is the DISTINCT-word frequency table (word, count, symbols) with
    symbols initialized to the word's characters — merges never cross word
    boundaries, no end-of-word marker (the within-word Sennrich variant);
  * per merge step: pair counts = Σ word-count over ADJACENT symbol pairs
    (a word contributes count × multiplicity); the merge picked is the
    (count DESC, left ASC, right ASC) argmax — a total order, so training
    is reproducible to the byte;
  * the merge (a, b) → ab is applied to every word's symbol array by the
    standard greedy LEFT-TO-RIGHT fold (so "aaa" under (a,a) becomes
    ["aa", "a"]); training stops early when no adjacent pair remains.

Scale shape: the state table is VOCABULARY-sized (distinct words), not
corpus-sized — the one corpus-sized pass is the initial word count. Each
merge step is (1) one explode of adjacent pairs over the vocab table +
one pair-keyed aggregate (map-side partials), (2) a 1-row argmax collect
(driver scalar — the scalars-only rule), (3) one map-side fold rewriting
the symbol arrays (``F.aggregate`` over list-of-one-element lists,
whole-stage codegen, no Python), localCheckpointed. num_merges steps,
each O(vocab); real deployments run thousands of merges over the same
shape. ``bpe_segment`` applies a learned merge list to new text map-only.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


@dataclass
class BPEResult:
    merges: list[tuple[str, str]]  # in learned order
    vocab: DataFrame  # final (word, count, symbols)
    metrics: list[dict] = field(default_factory=list)


def _apply_merge(col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right (a, b) → a||b over a symbol array column."""
    merged = F.lit(a + b)
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    num_merges: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> BPEResult:
    """Learn ``num_merges`` BPE merges from the corpus — see module
    docstring for the exact contract."""
    assert 1 <= num_merges <= 10_000
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("count"))
        .select(
            "w",
            "count",
            # Spark split(limit=-1) keeps a trailing '' — drop it
            F.filter(
                F.split(F.col("w"), "(?!^)"), lambda x: x != F.lit("")
            ).alias("symbols"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    metrics: list[dict] = []
    for step in range(1, num_merges + 1):
        t0 = time.time()
        pairs = (
            words.where(F.size("symbols") >= 2)
            .select(
                "count",
                F.explode(
                    F.arrays_zip(
                        F.slice(
                            "symbols", 1, F.size("symbols") - 1
                        ).alias("a"),
                        F.slice(
                            "symbols", 2, F.size("symbols") - 1
                        ).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("count").alias("n"))
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            "w",
            "count",
            _apply_merge(F.col("symbols"), a, b).alias("symbols"),
        ).localCheckpoint(eager=True)
        metrics.append(
            {"step": step, "merge": a + "+" + b, "n": int(top[0]["n"]),
             "wall_s": round(time.time() - t0, 4)}
        )
    return BPEResult(merges, words, metrics)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to ``df``'s text map-only: adds a
    ``subwords`` array column (per-word BPE pieces, flattened in word
    order)."""
    col = F.transform(
        tokens(text_col),
        lambda w: F.filter(F.split(w, "(?!^)"), lambda x: x != F.lit("")),
    )
    for a, b in merges:
        col = F.transform(col, lambda s: _apply_merge(s, a, b))
    return df.withColumn("subwords", F.flatten(col))


def bpe_train_single_node(
    texts: list[str], *, num_merges: int = 15
) -> list[tuple[str, str]]:
    """Single-node reference — the pytest parity oracle (same contract;
    pure Python)."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split():
            wc[w] += 1
    state = {w: list(w) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in state.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    return merges
