"""First-order Markov transition matrix over an event log — the empirical
next-state model behind user-navigation analysis (Markov click models,
PageRank's original "random surfer" was exactly this object estimated from
browsing logs) and session-based recommendation baselines.

Semantics: per entity, order events by (ts, event_id) — the same total
order the sessionization query uses, so ties are deterministic — take
consecutive (prev_state, state) pairs WITHIN an entity's stream, count
them, and normalize per source state:  p(dst | src) = n(src,dst) / n(src·).
Probabilities are rounded (6 dp) so the Spark double division and the
DuckDB replay agree bit-for-bit despite engine-dependent plan shapes (the
division itself is exact-operand; rounding absorbs nothing here but keeps
the float-parity convention uniform — driver_queries.py module docstring).

Scale shape: ONE shuffle (window partitioned by the entity key — web logs
have bounded per-user event counts, so no skewed partitions), then a
pair-keyed count whose key space is |states|² (tiny), then a src-keyed
window over that tiny aggregate for the normalizer. No Python, no
collect, no global window over row-scale data.

The driver gate hash-compares a LAG-window DuckDB replay
(`transitions_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Empirical first-order transition matrix
    (src_state, dst_state, n:long, p:double·6dp) over per-entity event
    streams ordered by (ts, tiebreak)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(entity_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(state_col).alias("dst_state"),
        )
        .withColumn("src_state", F.lag("dst_state").over(w))
        .where(F.col("src_state").isNotNull())
        .groupBy("src_state", "dst_state")
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src_state")
    return pairs.select(
        "src_state",
        "dst_state",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wsrc), 6
        ).alias("p"),
    )


def transition_matrix_single_node(
    rows: list[tuple[int, int, int, str]],
) -> dict[tuple[str, str], tuple[int, float]]:
    """Single-node reference over (entity, ts_us, tiebreak, state) rows:
    {(src,dst): (n, p·6dp)}."""
    from collections import defaultdict

    streams: dict[int, list[tuple[int, int, str]]] = defaultdict(list)
    for ent, ts, tb, st in rows:
        streams[ent].append((ts, tb, st))
    n: dict[tuple[str, str], int] = defaultdict(int)
    for evs in streams.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            n[(a, b)] += 1
    src_tot: dict[str, int] = defaultdict(int)
    for (a, _), c in n.items():
        src_tot[a] += c
    return {k: (c, round(c / src_tot[k[0]], 6)) for k, c in n.items()}
