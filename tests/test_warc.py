"""WARC ingestion (sources/warc.py): round-trip through the serializer,
plain and per-member-gzip variants, non-response records filtered,
truncation damage skipped, Spark mapInPandas path over binaryFile,
http_body splitting."""

from __future__ import annotations

import os

from connected_components_3d_spark.sources.warc import (
    http_body,
    make_warc_bytes,
    parse_warc_bytes,
    read_warc,
)

RECS = [
    (
        "https://a.example.com/",
        "2024-01-01T00:00:00Z",
        "<urn:uuid:1>",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>A</html>",
    ),
    (
        "https://b.example.com/x",
        "2024-01-02T00:00:00Z",
        "<urn:uuid:2>",
        b"HTTP/1.1 200 OK\r\n\r\n<html>B body \xe2\x82\xac</html>",
    ),
]


def test_round_trip_plain_and_gzip():
    for gz in (False, True):
        raw = make_warc_bytes(RECS, gzip_members=gz)
        got = parse_warc_bytes(raw)
        assert got == RECS


def test_non_response_records_filtered():
    raw = make_warc_bytes(RECS)
    raw = raw.replace(b"WARC-Type: response", b"WARC-Type: request", 1)
    got = parse_warc_bytes(raw)
    assert [r[0] for r in got] == ["https://b.example.com/x"]


def test_truncation_damage_skipped():
    raw = make_warc_bytes(RECS)
    got = parse_warc_bytes(raw[: len(raw) - 30])  # second record truncated
    assert [r[0] for r in got] == ["https://a.example.com/"]


def test_http_body():
    assert http_body(RECS[0][3]) == b"<html>A</html>"
    assert http_body(b"no header split") == b"no header split"


def test_spark_read_warc(spark, tmp_path):
    d = tmp_path / "warc"
    os.makedirs(d)
    (d / "part1.warc").write_bytes(make_warc_bytes(RECS[:1]))
    (d / "part2.warc.gz").write_bytes(
        make_warc_bytes(RECS[1:], gzip_members=True)
    )
    rows = sorted(
        (r["url"], r["warc_ts"], bytes(r["payload"]))
        for r in read_warc(spark, str(d)).collect()
    )
    assert rows == sorted((u, t, p) for u, t, _, p in RECS)
