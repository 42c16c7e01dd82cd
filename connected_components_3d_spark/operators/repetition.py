"""Gopher-style repetition quality filters (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1; carried into MassiveText / Dolma /
DataTrove): per-document fractions measuring how much of a page is the same
n-gram repeated — THE standard boilerplate/spam signal a webtext pipeline
applies before LLM training.

Contract (replayed bit-for-bit by the gate oracle and the single-node
reference):

- tokens are the engine-wide ``functions.text.tokens`` contract; an n-gram
  is n ADJACENT tokens inside one document, keyed by the '_'-joined string;
- character mass of an n-gram = sum of its token lengths (= length of the
  joined key minus the n-1 separators) — separators and dropped punctuation
  carry no mass, so the measure is tokenizer-stable;
- ``top_{n}gram_frac``  = count(most frequent n-gram) x its mass / total
  token mass of the doc, ties on count -> the heavier n-gram (deterministic;
  further ties are product-invariant so no third key is needed);
- ``dup_{n}gram_frac``  = sum of count x mass over n-grams occurring >= 2
  times / total mass (the Dolma/DataTrove all-occurrence variant of
  Gopher's covered-character fraction — documented choice: positional
  coverage needs per-position interval union, which neither engine can
  express relationally; the all-occurrence sum is the published
  reproduction convention);
- both capped at 1.0 (overlapping occurrences can exceed the doc mass:
  "a a a a" has top_2gram_frac mass 3x2 over total 4) and ROUND(.,6);
  empty/token-free docs report 0.0.

Scale shape: ONE explode produces every (n, gram) for all requested n
(flatten of per-n transforms — no per-n passes over the corpus), one
map-side-combinable (doc, n, gram) count, one (doc, n) fold, one doc-keyed
pivot-by-conditional-agg. All keys are high-cardinality (doc_id or
doc_id x gram); no windows, no Python, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def repetition_features(
    docs: DataFrame,
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, top_{n}gram_frac ... , dup_{n}gram_frac ...) — one row per
    input document (0.0 fractions for docs with no tokens)."""
    if not top_ns and not dup_ns:
        raise ValueError("repetition_features: need at least one n")
    if any(n < 1 for n in (*top_ns, *dup_ns)):
        raise ValueError(
            f"repetition_features: every n must be >= 1, got {top_ns} {dup_ns}"
        )
    all_ns = sorted(set(top_ns) | set(dup_ns))

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("t"),
    )
    totals = toks.select(
        "doc_id", F.length(F.concat_ws("", "t")).alias("total")
    )

    # One flattened gram stream for every n: struct(n, gram). The size
    # guard matters — sequence(0, size-n) is DESCENDING when size < n and
    # ANSI slice/indexing then throws (the collocations.py lesson).
    per_n = [
        F.when(
            F.size("t") >= n,
            F.expr(
                f"transform(sequence(0, size(t) - {n}),"
                f" i -> struct({n}L AS n,"
                f" concat_ws('_', slice(t, i + 1, {n})) AS g))"
            ),
        )
        .otherwise(F.expr("array()").cast("array<struct<n:long,g:string>>"))
        .alias(f"g{n}")
        for n in all_ns
    ]
    grams = (
        toks.select("doc_id", F.explode(F.flatten(F.array(*per_n))).alias("p"))
        .select("doc_id", "p.n", "p.g")
    )

    cnt = (
        grams.groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("c"))
        .withColumn("cm", F.length("g") - (F.col("n") - F.lit(1)).cast("int"))
    )
    pern = cnt.groupBy("doc_id", "n").agg(
        F.max(F.struct("c", "cm")).alias("s"),
        F.sum(
            F.when(F.col("c") >= 2, F.col("c") * F.col("cm")).otherwise(F.lit(0))
        ).alias("dupm"),
    )

    def frac(mass):  # capped, rounded, 0.0 when no tokens
        return F.round(
            F.when(
                F.col("total") > 0,
                F.least(
                    F.lit(1.0), F.coalesce(mass, F.lit(0)).cast("double") / F.col("total")
                ),
            ).otherwise(F.lit(0.0)),
            6,
        )

    wide_aggs = []
    out_cols = []
    for n in top_ns:
        wide_aggs.append(
            F.max(
                F.when(F.col("n") == n, F.col("s.c") * F.col("s.cm"))
            ).alias(f"_top{n}")
        )
        out_cols.append((f"top_{n}gram_frac", f"_top{n}"))
    for n in dup_ns:
        wide_aggs.append(
            F.max(F.when(F.col("n") == n, F.col("dupm"))).alias(f"_dup{n}")
        )
        out_cols.append((f"dup_{n}gram_frac", f"_dup{n}"))
    wide = pern.groupBy("doc_id").agg(*wide_aggs)

    return totals.join(wide, "doc_id", "left").select(
        "doc_id",
        *[frac(F.col(raw)).alias(name) for name, raw in out_cols],
    )


def repetition_features_single_node(
    texts: dict[int, str],
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
) -> dict[int, dict[str, float]]:
    """{doc_id: {col: frac}} under the module contract."""
    import re

    def tok(s):
        return [
            w
            for w in re.sub(r"[^a-z0-9]+", " ", (s or "").lower()).split(" ")
            if w
        ]

    out: dict[int, dict[str, float]] = {}
    for doc_id, text in texts.items():
        ws = tok(text)
        total = sum(len(w) for w in ws)
        row: dict[str, float] = {}
        for kind, ns in (("top", top_ns), ("dup", dup_ns)):
            for n in ns:
                counts: dict[str, int] = {}
                for i in range(len(ws) - n + 1):
                    g = "_".join(ws[i : i + n])
                    counts[g] = counts.get(g, 0) + 1
                if kind == "top":
                    mass = max(
                        (
                            (c, len(g) - (n - 1))
                            for g, c in counts.items()
                        ),
                        default=(0, 0),
                    )
                    mass = mass[0] * mass[1]
                else:
                    mass = sum(
                        c * (len(g) - (n - 1))
                        for g, c in counts.items()
                        if c >= 2
                    )
                row[f"{kind}_{n}gram_frac"] = (
                    round(min(1.0, mass / total), 6) if total > 0 else 0.0
                )
        out[doc_id] = row
    return out
