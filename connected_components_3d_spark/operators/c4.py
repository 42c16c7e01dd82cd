"""C4-style page cleaning (Raffel et al. 2020, §2.2 of the T5 paper; the
rule set carried into mC4 / FineWeb's "C4 filters" stage): line-level
keep/drop rules plus page-level quality flags — the canonical first-pass
heuristic cleanup a Common-Crawl-style corpus gets before dedup/LM scoring.

Contract (replayed bit-for-bit by the gate oracle and the single-node
reference):

- lines = ``text`` split on chr(10); each line is TRIMMED before testing
  and emitted trimmed (the join separator is chr(10));
- a line is KEPT iff ALL of: its trimmed form ends in a terminal character
  (one of ``. ! ? "``), it contains >= ``min_words`` words (a word is a
  maximal ``[A-Za-z0-9]+`` run), and its lowercase form does not contain
  the substring 'javascript' (C4's "enable javascript" boilerplate rule);
- ``clean_text`` = kept trimmed lines joined by chr(10) ('' if none);
- page flags on the ORIGINAL text: ``has_lorem`` (lowercase contains
  'lorem ipsum'), ``has_brace`` (contains '{' — C4 drops source-code-ish
  pages);
- ``n_sentences`` = count of ``. ! ?`` characters in ``clean_text`` (the
  cheap sentence proxy C4 reproductions use);
- ``keep_doc`` = n_sentences >= min_sentences AND NOT has_lorem AND NOT
  has_brace;
- NULL text ≡ empty text.

Scale shape: pure per-row native expressions (split + higher-order
filter/transform lambdas + regexp_extract_all), JVM-side whole-stage
codegen; zero shuffles, zero Python. ``c4_clean`` is a filter + projection
over ``c4_features`` and keeps the full input schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TERMINAL_RE = r'[.!?"]$'
_WORD_RE = r"[A-Za-z0-9]+"


def _features_cols(txt: F.Column, min_words: int, min_sentences: int):
    lines = F.split(txt, "\n")
    kept = F.filter(
        lines,
        lambda x: F.trim(x).rlike(_TERMINAL_RE)
        & (
            F.size(F.regexp_extract_all(F.trim(x), F.lit(_WORD_RE), F.lit(0)))
            >= min_words
        )
        & ~F.lower(x).contains("javascript"),
    )
    # NB: F.transform(kept, F.trim) is WRONG — trim's optional second
    # parameter makes the HOF pass the element index as the trim-char set.
    clean = F.array_join(F.transform(kept, lambda x: F.trim(x)), "\n")
    # split('', pat) yields [''] in Spark AND DuckDB: one "line", never kept.
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    has_lorem = F.lower(txt).contains("lorem ipsum")
    has_brace = txt.contains("{")
    n_sentences = F.size(
        F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0))
    ).cast("long")
    keep_doc = (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
    return n_lines, n_kept, has_lorem, has_brace, n_sentences, keep_doc, clean


def c4_features(
    docs: DataFrame,
    *,
    min_words: int = 3,
    min_sentences: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, kept_frac, has_lorem, has_brace,
    n_sentences, keep_doc, clean_len, clean_md5) — one row per doc."""
    if min_words < 1 or min_sentences < 0:
        raise ValueError(
            f"c4_features: bad thresholds {min_words=} {min_sentences=}"
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))
    (n_lines, n_kept, has_lorem, has_brace, n_sent, keep_doc, clean) = (
        _features_cols(txt, min_words, min_sentences)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        F.round(n_kept.cast("double") / n_lines, 6).alias("kept_frac"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        n_sent.alias("n_sentences"),
        keep_doc.alias("keep_doc"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def c4_clean(
    docs: DataFrame,
    *,
    min_words: int = 3,
    min_sentences: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The surviving corpus: docs passing ``keep_doc`` with ``text_col``
    replaced by ``clean_text``; every other input column rides through."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    (_, _, has_lorem, has_brace, n_sent, keep_doc, clean) = _features_cols(
        txt, min_words, min_sentences
    )
    return docs.where(keep_doc).withColumn(text_col, clean)


def c4_features_single_node(
    texts: dict[int, str], min_words: int = 3, min_sentences: int = 3
) -> dict[int, dict]:
    """{doc_id: row-dict} under the module contract — pytest parity oracle."""
    import hashlib
    import re

    out: dict[int, dict] = {}
    for doc_id, text in texts.items():
        t = text or ""
        lines = t.split("\n")
        kept = [
            s
            for s in (x.strip() for x in lines)
            if re.search(_TERMINAL_RE, s)
            and len(re.findall(_WORD_RE, s)) >= min_words
            and "javascript" not in s.lower()
        ]
        clean = "\n".join(kept)
        has_lorem = "lorem ipsum" in t.lower()
        has_brace = "{" in t
        n_sent = len(re.findall(r"[.!?]", clean))
        out[doc_id] = {
            "n_lines": len(lines),
            "n_kept": len(kept),
            "kept_frac": round(len(kept) / len(lines), 6),
            "has_lorem": has_lorem,
            "has_brace": has_brace,
            "n_sentences": n_sent,
            "keep_doc": n_sent >= min_sentences
            and not has_lorem
            and not has_brace,
            "clean_len": len(clean),
            "clean_md5": hashlib.md5(clean.encode()).hexdigest(),
        }
    return out
