"""Physical-plan auditing (SURVEY.md §4.2): verify that Catalyst delivers
the optimizations the engine relies on — predicate pushdown into parquet,
column pruning, broadcast joins for small dims, whole-stage codegen, and
top-k as TakeOrderedAndProject — instead of hand-scheduling them."""

from .audit import (
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    read_schemas,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_str",
    "pushed_filters",
    "read_schemas",
    "wholestage_codegen_count",
]
