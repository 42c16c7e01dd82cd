"""HTML → text / href extraction.

The per-row invariant [BASELINE.json:15]: *byte-identical extracted text per
url* between the distributed path and the single-node reference extractor.
/root/reference is empty (SURVEY.md §0), so the reference extractor is the
pure function :func:`extract_text_py` below; the Spark path wraps the SAME
function in a scalar pandas UDF (Arrow-batched, vectorized over pd.Series —
never per-row Python at the Spark API layer), and
tests/test_extraction.py asserts Spark output == a plain single-node Python
loop over the same rows, byte for byte.

Everything here is deterministic, stdlib-only, and order-free.
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# --- pure single-node reference implementation ------------------------------

# non-content containers whose INNER TEXT must not leak into the extract:
# script/style (code), noscript (fallback-only), template (inert DOM),
# svg/iframe (foreign/embedded content). Paired form first; an UNCLOSED
# script/style then drops to end-of-document (what a streaming parser does
# with a truncated page — the common Common-Crawl failure mode).
_RE_SCRIPT = re.compile(
    rb"(?is)<(script|style|noscript|template|svg|iframe)\b.*?</\1\s*>"
)
_RE_SCRIPT_OPEN = re.compile(rb"(?is)<(?:script|style)\b.*\Z")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_CDATA = re.compile(rb"(?s)<!\[CDATA\[.*?\]\]>")
# quoted-attribute-aware tag stripper: '>' inside "..."/'...' attribute
# values does not terminate the tag (each byte matches exactly one
# alternative — no backtracking blowup); the plain fallback then catches
# malformed remnants (unterminated quotes etc.)
_RE_TAG = re.compile(rb"(?s)<(?:[^<>\"']|\"[^\"]*\"|'[^']*')*>")
_RE_TAG_FALLBACK = re.compile(rb"(?s)<[^>]*>")
_RE_WS = re.compile(r"\s+")

_RE_HREF = re.compile(
    rb"""(?is)<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
)


def extract_text_py(html: bytes | None) -> str | None:
    """Reference extractor: drop comments/CDATA, drop non-content containers
    (script/style/noscript/template/svg/iframe, with an unclosed
    script/style falling through to end-of-document), strip tags
    (quoted-attribute-aware), unescape entities, collapse whitespace.
    Pure, deterministic, byte-stable; identical output to the pre-round-5
    rules on well-formed markup without the newly-handled constructs."""
    if html is None:
        return None
    raw = _RE_COMMENT.sub(b" ", html)
    raw = _RE_CDATA.sub(b" ", raw)
    raw = _RE_SCRIPT.sub(b" ", raw)
    raw = _RE_SCRIPT_OPEN.sub(b" ", raw)
    raw = _RE_TAG.sub(b" ", raw)
    raw = _RE_TAG_FALLBACK.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    text = _htmlmod.unescape(text)
    return _RE_WS.sub(" ", text).strip()


def normalize_url(href: str, base_url: str | None) -> str | None:
    """Resolve relative refs, strip fragments, lowercase scheme+host.

    Rejects non-http(s) schemes (mailto:, javascript:, data:).
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    try:
        absu = urljoin(base_url or "", href)
        parts = urlsplit(absu)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if not netloc:
        return None
    return urlunsplit((parts.scheme.lower(), netloc, parts.path, parts.query, ""))


def extract_hrefs_py(html: bytes | None, base_url: str | None) -> list[str] | None:
    """Reference href extractor: all <a href=...> targets, normalized,
    de-duplicated preserving first-seen order (order irrelevant downstream —
    the edge builder applies DISTINCT — but determinism is free). Anchors
    inside comments, CDATA, or script/style bodies are NOT links a browser
    renders, so those regions are stripped before the scan (same rules as
    ``extract_text_py``)."""
    if html is None:
        return None
    html = _RE_COMMENT.sub(b" ", html)
    html = _RE_CDATA.sub(b" ", html)
    html = _RE_SCRIPT.sub(b" ", html)
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE_HREF.finditer(html):
        raw = next(g for g in m.groups() if g is not None)
        url = normalize_url(raw.decode("utf-8", errors="replace"), base_url)
        if url is not None and url not in seen:
            seen.add(url)
            out.append(url)
    return out


# --- vectorized Spark surface ------------------------------------------------


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Scalar pandas UDF: Arrow-batched html(binary) → text(string)."""
    return html.map(extract_text_py)


@pandas_udf(ArrayType(StringType()))
def extract_hrefs(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Scalar pandas UDF: (html, url) → array<string> of normalized hrefs."""
    return pd.Series(
        [extract_hrefs_py(h, u) for h, u in zip(html, base_url)], dtype=object
    )
