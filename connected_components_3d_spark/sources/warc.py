"""WARC ingestion — read real Common-Crawl-style WARC files into the
engine's pages schema (url, warc_ts, html, …) with NOTHING beyond the
Python stdlib: WARC/1.x is plain-text record framing (ISO 28500 — header
block, blank line, payload of Content-Length bytes, two CRLFs), and
Common Crawl ships it either plain or as per-member-gzip'd concatenations
(each record its own gzip member — exactly what ``zlib`` with window bits
31 decodes member-by-member).

Pipeline shape: ``spark.read.format("binaryFile")`` lists and reads the
.warc / .warc.gz files (one row per file: path, content) — Spark
parallelizes across FILES, the natural Common-Crawl unit (100k × ~1 GB
segments); per-file record parsing runs in ``mapInPandas`` (Arrow-batched,
the multimodal.py pattern — per-row Python is over FILES, not records,
and the inner loop is bytes.find/slice, not Python-per-byte). Emitted
rows: one per ``WARC-Type: response`` record —

    (url:string, warc_ts:string, record_id:string, payload:binary)

``warc_ts`` stays the raw WARC-Date string (cast downstream); ``payload``
is the full HTTP response block (headers + body — ``http_body`` splits
it). Malformed tails/records are SKIPPED, counted nowhere: crawl archives
contain truncation damage and a 10^12-page ingest must shrug, not die
(the strict single-node parser below is the pytest oracle and DOES raise,
so damage is visible in tests).
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts string, record_id string, payload binary"
)


def _split_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record; stop silently on damage."""
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + 5] != b"WARC/":
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break
        yield headers, raw[body_start : body_start + length]
        pos = body_start + length + 4  # payload + CRLF CRLF


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (or pass through)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        d = zlib.decompressobj(31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(raw: bytes) -> list[tuple[str, str, str, bytes]]:
    """Single-node reference parser (also the mapInPandas worker body):
    response records of a (possibly per-member-gzip'd) WARC byte string."""
    rows = []
    for headers, payload in _split_records(_gunzip_members(raw)):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        rid = headers.get("warc-record-id", "")
        rows.append((url, ts, rid, payload))
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` → one row per response record — see
    module docstring for the exact schema and skip semantics."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "record_id": [], "payload": []}
            for content in pdf["content"]:
                try:
                    recs = parse_warc_bytes(bytes(content))
                except Exception:
                    continue  # damaged member: skip the file tail
                for url, ts, rid, payload in recs:
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["record_id"].append(rid)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return files.select("content").mapInPandas(_parse, WARC_SCHEMA)


def http_body(payload: bytes) -> bytes:
    """Split the HTTP response block: bytes after the first CRLFCRLF."""
    i = payload.find(b"\r\n\r\n")
    return payload[i + 4 :] if i >= 0 else payload


def make_warc_bytes(
    records: list[tuple[str, str, str, bytes]], *, gzip_members: bool = False
) -> bytes:
    """Serialize (url, ts, record_id, payload) rows into WARC/1.0 bytes —
    the test-side generator (round-trips with ``parse_warc_bytes``)."""
    import gzip as _gzip

    out = []
    for url, ts, rid, payload in records:
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"WARC-Record-ID: {rid}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        rec = hdr + payload + b"\r\n\r\n"
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
