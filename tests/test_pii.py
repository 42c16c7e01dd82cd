"""PII detection/redaction parity and semantics (operators/pii.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from connected_components_3d_spark.operators.pii import (
    PII_PATTERNS,
    pii_features,
    pii_features_single_node,
    redact_pii,
)

CASES = {
    0: "contact alice.smith+spam@mail.example.co.uk or bob@x.io today",
    1: "call 415-555-0134 or 212-555-9876 now",
    2: "ssn 078-05-1120 leaked; phone-shaped 123-456-7890 too",
    3: "pay with 4111-1111-1111-1111 or 4000 1234 5678 9010",
    4: "hosts 10.0.0.1 and 192.168.255.254; version 1.2.3 is not an ip",
    5: "mixed: a@b.co 10.1.2.3 999-99-9999 555-123-4567 4444-4444-4444-4444",
    6: "",
    7: None,
    8: "no pii here at all, just words and 12345 numbers 678-90",
    9: "adjacent emails x@y.de,z@w.fr and dotted 8.8.8.8.",
    10: "email with digits user555-123-4567x@ex.com then 314-159-2653",
}


def docs_df(spark):
    return spark.createDataFrame(
        list(CASES.items()), "doc_id long, text string"
    )


def test_parity_vs_single_node(spark):
    got = {r["doc_id"]: r.asDict() for r in pii_features(docs_df(spark)).collect()}
    want = pii_features_single_node({k: v for k, v in CASES.items()})
    assert set(got) == set(want)
    for k in want:
        row = {c: got[k][c] for c in want[k]}
        assert row == want[k], f"doc {k}: {row} != {want[k]}"


def test_redaction_removes_everything(spark):
    red = redact_pii(docs_df(spark))
    feats = pii_features(red)
    for r in feats.collect():
        assert r["n_pii"] == 0, r


def test_redaction_idempotent(spark):
    once = {r["doc_id"]: r["text"] for r in redact_pii(docs_df(spark)).collect()}
    twice = {
        r["doc_id"]: r["text"]
        for r in redact_pii(redact_pii(docs_df(spark))).collect()
    }
    assert once == twice


def test_counts_and_classes():
    want = pii_features_single_node(CASES)
    assert want[0]["n_email"] == 2
    assert want[1]["n_phone"] == 2
    assert want[2]["n_ssn"] == 1 and want[2]["n_phone"] == 1
    # dashed card counted; space-separated digit groups are not (by contract
    # the space variant IS in the pattern — both forms must count)
    assert want[3]["n_cc"] == 2
    assert want[4]["n_ipv4"] == 2
    assert want[5]["n_pii"] == 5
    assert want[6]["n_pii"] == 0 and want[7]["n_pii"] == 0
    assert want[8]["n_pii"] == 0
    assert want[9]["n_email"] == 2 and want[9]["n_ipv4"] == 1
    # 'user555-...' has NO \b before 555 (r→5 is word→word), so only the
    # standalone phone counts; the email still matches in full
    assert want[10]["n_email"] == 1 and want[10]["n_phone"] == 1


def test_emails_sorted_distinct(spark):
    df = spark.createDataFrame(
        [(1, "b@b.io a@a.io b@b.io")], "doc_id long, text string"
    )
    [r] = pii_features(df).collect()
    assert r["emails"] == "a@a.io,b@b.io"


def test_redacted_text_shape(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co then 10.0.0.1 end")], "doc_id long, text string"
    )
    [r] = redact_pii(df).collect()
    assert r["text"] == "mail [EMAIL] then [IPV4] end"


def test_patterns_common_dialect():
    """Patterns must stay in the Java∩RE2 subset: no lookaround/backrefs."""
    for pat in PII_PATTERNS.values():
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        assert not re.search(r"\\[1-9]", pat)
        re.compile(pat)


def test_full_schema_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "x@y.io", "web")], "doc_id long, text string, source string"
    )
    out = redact_pii(df)
    assert out.columns == ["doc_id", "text", "source"]
    assert out.collect()[0]["source"] == "web"
