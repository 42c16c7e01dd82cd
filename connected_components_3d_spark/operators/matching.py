"""Deterministic maximal matching via parallel local-min handshakes — the
pairing / graph-coarsening primitive (multilevel partitioners contract a
maximal matching per level; dedup pipelines use it to pick disjoint merge
pairs).

Algorithm (the random-priority greedy of Israeli–Itai / Luby, made
deterministic): give every canonical undirected edge {u, v} (u < v) the
priority

    key(u, v) = mix(mix(seed, u), v) * M + u,
    mix(a, b) = (a * 1103515245 + b) % M,    M = 2147483647

(the walks.py integer-mix family: products < 2^62, literals long-cast, so
Spark and DuckDB compute identical values; the ``* M + u`` tail plus u < v
canonicalization makes priorities distinct, so every argmin below is
tie-free). Each round, every vertex nominates its minimum-key incident
edge; an edge whose BOTH endpoints nominate it joins the matching
("handshake"), its endpoints leave the graph, and surviving edges go to the
next round. Greedy-by-priority ⇒ the result is exactly the sequential
greedy matching over the key order — maximal by construction — and with
pseudo-random priorities the round count is O(log m) w.h.p. (Blelloch–
Fineman–Shun 2012 analysis of priority greedy), the same depth class as the
k-core peel.

Scale shape (the kcore.py pattern): state is one monotonically SHRINKING
edge table, localCheckpoint-ed per round; each round is two vertex-keyed
MIN aggregates + two semi/anti-joins (edge-sized, on high-cardinality
vertex keys) and ONE scalar count action. No windows, no per-row Python,
no driver-side data collects.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


@dataclass
class MatchingResult:
    # (u:long, v:long) with u < v — a maximal matching: every vertex appears
    # at most once, and every input edge has ≥1 matched endpoint
    matching: DataFrame
    num_rounds: int
    metrics: list[dict] = field(default_factory=list)


def _mix(a, b):
    return (a * F.lit(_A).cast("long") + b) % F.lit(_M).cast("long")


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int = 200,
) -> MatchingResult:
    """Maximal matching of the UNDIRECTED graph given by ``edges`` (src,
    dst; direction and duplicates ignored, self-loops dropped) per the
    module-docstring deterministic handshake contract."""
    assert 0 <= seed < _M
    e = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias(
                "u"
            ),
            F.greatest(
                F.col("src").cast("long"), F.col("dst").cast("long")
            ).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    rng = e.agg(
        F.min("u").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "maximal_matching requires vertex ids in [0, 2^31): the priority"
            " determinism contract does negative-unsafe modular arithmetic"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )
    live = e.select(
        "u",
        "v",
        (
            _mix(_mix(F.lit(seed).cast("long"), F.col("u")), F.col("v"))
            * F.lit(_M).cast("long")
            + F.col("u")
        ).alias("key"),
    ).localCheckpoint(eager=True)
    matched: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    n_live = live.count()
    while n_live > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_matching failed to converge in {max_rounds} rounds"
                f" ({n_live} edges still live) — priorities are tie-free, so"
                " this indicates a bug, not an input property"
            )
        t0 = time.time()
        vmin = (
            live.select(F.col("u").alias("vertex"), "key")
            .unionByName(live.select(F.col("v").alias("vertex"), "key"))
            .groupBy("vertex")
            .agg(F.min("key").alias("mk"))
        )
        picked = (
            live.join(
                vmin.select(F.col("vertex").alias("u"), F.col("mk").alias("mu")),
                "u",
            )
            .join(
                vmin.select(F.col("vertex").alias("v"), F.col("mk").alias("mv")),
                "v",
            )
            .where((F.col("key") == F.col("mu")) & (F.col("key") == F.col("mv")))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        matched.append(picked)
        mv = (
            picked.select(F.col("u").alias("vertex"))
            .unionByName(picked.select(F.col("v").alias("vertex")))
        )
        live = (
            live.join(mv.withColumnRenamed("vertex", "u"), "u", "left_anti")
            .join(mv.withColumnRenamed("vertex", "v"), "v", "left_anti")
            .select("u", "v", "key")
            .localCheckpoint(eager=True)
        )
        n_live = live.count()
        metrics.append(
            {
                "round": rounds,
                "live_edges": n_live,
                "wall_s": round(time.time() - t0, 4),
            }
        )
    if matched:
        from functools import reduce

        out = reduce(DataFrame.unionByName, matched)
    else:
        out = e.select("u", "v").limit(0)
    return MatchingResult(out, rounds, metrics)


def maximal_matching_single_node(
    pairs: list[tuple[int, int]], *, seed: int = 42
) -> list[tuple[int, int]]:
    """Single-node reference — sequential greedy over the identical priority
    order (the parallel handshake provably computes exactly this)."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    def key(uv):
        u, v = uv
        return (((seed * _A + u) % _M) * _A + v) % _M * _M + u

    used: set[int] = set()
    out: list[tuple[int, int]] = []
    for u, v in sorted(es, key=key):
        if u not in used and v not in used:
            used.add(u)
            used.add(v)
            out.append((u, v))
    return sorted(out)
