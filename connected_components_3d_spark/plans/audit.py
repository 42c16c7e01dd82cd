"""Explain-plan introspection helpers.

Used by tests/test_plans.py to assert the physical plans are the ones we
want at 100 TB — filters reaching the parquet scan (`PushedFilters`),
scans reading only projected columns (`ReadSchema`), small dims broadcast
(`BroadcastHashJoin`), wide codegen spans — not just the first plan that
happens to return correct rows.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text df.explain(mode) prints, captured."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """One raw PushedFilters string per parquet scan in the plan (filter
    predicates themselves contain commas — no splitting)."""
    text = explain_str(df, "formatted")
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text)
        if m.group(1).strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per scan (column-pruning audit)."""
    text = explain_str(df, "formatted")
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = fewer
    all-to-all data movements; broadcast exchanges not counted)."""
    text = explain_str(df, "formatted")
    return len(re.findall(r"\bExchange hashpartitioning", text)) + len(
        re.findall(r"\bExchange rangepartitioning", text)
    )


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", explain_str(df, "formatted")))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer = more fused)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "formatted"))))
