"""Deterministic maximal independent set via Luby-style local-min rounds —
the vertex analogue of operators/matching.py's handshake and the scheduling
/ symmetry-breaking primitive (greedy coloring, parallel scheduling, landmark
/ seed selection over web graphs all start from an MIS).

Algorithm (Luby 1986's random-priority MIS, made deterministic): give every
vertex the tie-free priority

    key(v) = mix(mix(seed, v), 0) * M + v,
    mix(a, b) = (a * 1103515245 + b) % M,    M = 2147483647

(the outer mix(·, 0) scramble makes v enter MULTIPLICATIVELY — a single
mix is affine in v, so for contiguous ids the greedy order would collapse
to ascending id regardless of seed — the walks.py/sampling.py lesson)

(the walks.py integer-mix family: products < 2^62, literals long-cast, so
Spark and DuckDB compute identical values; the ``* M + v`` tail makes keys
distinct, so the local-min test below is tie-free). Each round, every live
vertex whose key is strictly smaller than every live neighbour's key joins
the MIS; winners AND their neighbours leave the graph. The result is exactly
the LEXICOGRAPHICALLY-FIRST MIS in key order — i.e. the sequential greedy
"add v iff no earlier-keyed neighbour was added" — because a vertex is a
round's local min iff every smaller-keyed neighbour was already eliminated
(Blelloch–Fineman–Shun 2012: greedy sequential MIS is parallel on average,
O(log n) rounds w.h.p. for pseudo-random priorities). The vertex set is the
endpoints of the SURVIVING simple edges: self-loops are dropped by edge
hygiene (simple-graph convention used engine-wide), so a vertex whose only
edge is a self-loop is absent from the graph — and from the output —
entirely (same contract as matching.py; pass such vertices through an
explicit union downstream if they must appear).

Scale shape (the kcore.py peel envelope): state is a monotonically
SHRINKING vertex table + induced edge table, localCheckpoint-ed per round;
each round is one vertex-keyed MIN aggregate (the neighbour-min), one
left join (the winner test), two semi/anti-joins (the removal), and ONE
scalar count action. No windows, no per-row Python, no driver-side data
collects. The driver gate hash-compares the output against a fixed-round
chained-CTE DuckDB replay of the identical contract (`mis_tree`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


@dataclass
class MISResult:
    # (vertex:long) — a maximal independent set in the greedy key order:
    # no two members adjacent; every non-member has a member neighbour
    mis: DataFrame
    num_rounds: int
    metrics: list[dict] = field(default_factory=list)


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    *,
    seed: int = 42,
    max_rounds: int = 200,
) -> MISResult:
    """Maximal independent set of the UNDIRECTED graph given by ``edges``
    (src, dst; direction and duplicates ignored, self-loops dropped) per the
    module-docstring deterministic local-min contract. Vertex ids must lie
    in [0, 2^31) — the same determinism-contract guard as matching.py."""
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
    rng = e.agg(F.min("u").alias("lo"), F.max("v").alias("hi")).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "maximal_independent_set requires vertex ids in [0, 2^31): the"
            " priority determinism contract does negative-unsafe modular"
            f" arithmetic (got range [{rng['lo']}, {rng['hi']}])"
        )

    def key_of(col):
        m1 = (
            F.lit(seed).cast("long") * F.lit(_A).cast("long") + col
        ) % F.lit(_M).cast("long")
        m2 = (m1 * F.lit(_A).cast("long")) % F.lit(_M).cast("long")
        return m2 * F.lit(_M).cast("long") + col

    verts = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .distinct()
        .select("vertex", key_of(F.col("vertex")).alias("key"))
        .localCheckpoint(eager=True)
    )
    # carry both endpoint keys on the edge so the per-round neighbour-min
    # needs no join back to the vertex table
    live_e = e.select(
        "u", "v", key_of(F.col("u")).alias("ku"), key_of(F.col("v")).alias("kv")
    ).localCheckpoint(eager=True)
    winners_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    n_live = verts.count()
    while n_live > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_independent_set failed to converge in {max_rounds}"
                f" rounds ({n_live} vertices still live) — priorities are"
                " tie-free, so this indicates a bug, not an input property"
            )
        t0 = time.time()
        nbr_min = (
            live_e.select(F.col("u").alias("vertex"), F.col("kv").alias("nk"))
            .unionByName(
                live_e.select(F.col("v").alias("vertex"), F.col("ku").alias("nk"))
            )
            .groupBy("vertex")
            .agg(F.min("nk").alias("mn"))
        )
        win = (
            verts.join(nbr_min, "vertex", "left")
            .where(F.col("mn").isNull() | (F.col("key") < F.col("mn")))
            .select("vertex")
            .localCheckpoint(eager=True)
        )
        winners_parts.append(win)
        removed = (
            win.unionByName(
                live_e.join(
                    win.withColumnRenamed("vertex", "u"), "u", "left_semi"
                ).select(F.col("v").alias("vertex"))
            )
            .unionByName(
                live_e.join(
                    win.withColumnRenamed("vertex", "v"), "v", "left_semi"
                ).select(F.col("u").alias("vertex"))
            )
            .distinct()
        )
        verts = (
            verts.join(removed, "vertex", "left_anti")
            .localCheckpoint(eager=True)
        )
        live_e = (
            live_e.join(removed.withColumnRenamed("vertex", "u"), "u", "left_anti")
            .join(removed.withColumnRenamed("vertex", "v"), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        n_live = verts.count()
        metrics.append(
            {
                "round": rounds,
                "live_vertices": n_live,
                "wall_s": round(time.time() - t0, 4),
            }
        )
    if winners_parts:
        out = reduce(DataFrame.unionByName, winners_parts)
    else:
        out = e.select(F.col("u").alias("vertex")).limit(0)
    return MISResult(out, rounds, metrics)


def maximal_independent_set_single_node(
    pairs: list[tuple[int, int]], *, seed: int = 42
) -> set[int]:
    """Single-node reference — sequential greedy over the identical key
    order (the parallel local-min provably computes exactly this)."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = {x for p in es for x in p}
    nbrs: dict[int, set[int]] = {v: set() for v in verts}
    for u, v in es:
        nbrs[u].add(v)
        nbrs[v].add(u)

    def key(v):
        return ((seed * _A + v) % _M) * _A % _M * _M + v

    out: set[int] = set()
    for v in sorted(verts, key=key):
        if not (nbrs[v] & out):
            out.add(v)
    return out
