"""PII detection and redaction over a document corpus — the scrubbing pass
every webtext→LLM-training pipeline runs before release (cf. the C4/Dolma/
FineWeb postprocessing stages and the "PII reduction" appendices of the
Gopher/Llama data cards): find emails, NANP phone numbers, SSNs, IPv4
addresses and 16-digit card numbers, count them per document, and emit a
typed-placeholder redacted text.

Contract (replayed bit-for-bit by the gate oracle and the single-node
reference):

- patterns are the fixed ``PII_PATTERNS`` table below — deliberately the
  common Java-regex ∩ RE2 subset (character classes, bounded repeats,
  ``\\b`` word boundaries; no lookaround, no backrefs) so Spark (Java regex)
  and the DuckDB oracle (RE2) match byte-for-byte;
- counts are non-overlapping leftmost matches on the ORIGINAL text, each
  pattern independently (the standard reporting convention — a string that
  is both an SSN and part of an email counts for both);
- redaction applies ``regexp_replace`` in the FIXED order email → cc → ssn
  → phone → ipv4 (longest/most-specific first), replacing every match with
  ``[EMAIL]`` / ``[CC]`` / ``[SSN]`` / ``[PHONE]`` / ``[IPV4]``.  The
  patterns are pairwise non-overlapping on digit-group shape (3-3-4 vs
  3-2-4 vs 4-4-4-4 vs dotted quads), so the order only matters for emails
  whose local part embeds a phone-shaped digit run — email-first makes
  redaction idempotent;
- ``emails`` is the ','-joined ascending-sorted DISTINCT email list (the
  one value class worth surfacing for allow-listing);
- NULL text ≡ empty text (0 counts, '' redaction).

Scale shape: pure per-row native expressions (regexp_extract_all /
regexp_replace, JVM-side, whole-stage codegen) — zero shuffles, zero
Python; the operator composes with any upstream scan and pushes column
pruning down to (id_col, text_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Ordered: redaction applies top to bottom. Keys double as column suffixes
# and placeholder tags.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "cc": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _redact_expr(col: F.Column) -> F.Column:
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, F.lit(pat), F.lit(f"[{kind.upper()}]"))
    return out


def redact_pii(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """``docs`` with ``text_col`` replaced by its typed-placeholder
    redaction (schema otherwise untouched; NULL → '')."""
    return docs.withColumn(
        text_col, _redact_expr(F.coalesce(F.col(text_col), F.lit("")))
    )


def pii_features(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_email, n_cc, n_ssn, n_phone, n_ipv4, n_pii, emails,
    redacted_len, redacted_md5) — one row per input document."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        kind: F.size(F.regexp_extract_all(txt, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }
    redacted = _redact_expr(txt)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.cast("long").alias(f"n_{kind}") for kind, c in counts.items()],
        total.cast("long").alias("n_pii"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.regexp_extract_all(
                        txt, F.lit(PII_PATTERNS["email"]), F.lit(0)
                    )
                )
            ),
            ",",
        ).alias("emails"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def pii_features_single_node(texts: dict[int, str]) -> dict[int, dict]:
    """{doc_id: row-dict} under the module contract, via Python ``re`` —
    the pytest parity oracle."""
    import hashlib
    import re

    out: dict[int, dict] = {}
    for doc_id, text in texts.items():
        t = text or ""
        row: dict = {}
        total = 0
        for kind, pat in PII_PATTERNS.items():
            n = len(re.findall(pat, t))
            row[f"n_{kind}"] = n
            total += n
        row["n_pii"] = total
        row["emails"] = ",".join(
            sorted(set(re.findall(PII_PATTERNS["email"], t)))
        )
        red = t
        for kind, pat in PII_PATTERNS.items():
            red = re.sub(pat, f"[{kind.upper()}]", red)
        row["redacted_len"] = len(red)
        row["redacted_md5"] = hashlib.md5(red.encode()).hexdigest()
        out[doc_id] = row
    return out
