"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style):
the standard input-producing step of a graph-embedding training pipeline —
one fixed-length pseudo-random walk per start vertex, re-expressed as k
chained DataFrame join+argmin supersteps.

Determinism contract (fixed — the single-node oracle and the DuckDB
chained-CTE gate oracle replay it bit-for-bit): at step t, walk w standing
on vertex v moves to the out-neighbor u that MINIMIZES

    key(w, t, u) = mix(mix(mix(mix(seed, w), t), u), 0) * M + u
    mix(a, b)    = (a * 1103515245 + b) % M,     M = 2147483647

— an LCG-style integer mix chosen because every intermediate stays under
2^31 and every product under 2^62, so Spark (long arithmetic, literals
explicitly cast so ANSI mode never sees a 32-bit fold) and DuckDB
(overflow-checked BIGINT) compute the identical value. The final
``mix(·, 0)`` — a multiplicative scramble — is load-bearing: without it the
candidate u enters only additively, so argmin_u((c + u) % M) degenerates to
"smallest out-neighbor" whenever c + u doesn't wrap, and the walk is
seed-independent. After the scramble the key is still injective in u
(u < M and M = 2^31 − 1 is prime ⇒ both u ↦ (c+u) % M and x ↦ x·A % M are
bijections), so the argmin is total and tie-free; the trailing ``* M + u``
keeps distinctness across walks and lets the next vertex be recovered as
``key % M``. Under an ideal mix each out-neighbor is equally likely — the
uniform next-hop distribution DeepWalk samples — while staying exactly
replayable. Walks stop early at sinks (no out-edge). Requires vertex ids in
[0, 2^31) and ``seed``/``walk_length`` small ints (asserted).

Scale shape (SURVEY.md §4.3): the adjacency is laid down ONCE,
hash-partitioned + sorted by ``src`` (the O7 shuffle-once layout); each of
the k steps sort-merge-joins the walk-frontier (≤V rows) against it, takes
a frontier-keyed MIN aggregate (partial+final — frontier-sized shuffle,
never edge-sized), and localCheckpoints the new frontier so lineage stays
flat. Emitted corpus rows accumulate per step and union at the end — no
growing array column rides the per-step shuffle.
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
class WalkResult:
    # (walk_id:long, step:int, vertex:long) — walk_id = start vertex;
    # step 0 is the start; a walk that hits a sink has no further rows
    corpus: DataFrame
    walk_length: int
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _mix(a, b):
    """(a * A + b) % M on BIGINT columns — literals cast to long so the
    arithmetic (including Catalyst constant folding of literal subtrees)
    never runs in 32-bit ints, where seed * A would overflow under ANSI."""
    return (a * F.lit(_A).cast("long") + b) % F.lit(_M).cast("long")


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    *,
    walk_length: int = 8,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> WalkResult:
    """Fixed-length deterministic pseudo-random walks over the DIRECTED
    edge table ``(src, dst)`` — one walk per start vertex (default: every
    vertex that appears in the graph), next hop per the module-docstring
    argmin-of-mix contract.

    ``starts`` optionally restricts the start set (a ``vertex`` column).
    Returns the corpus as (walk_id, step, vertex) rows.
    """
    assert 0 <= seed < _M and 1 <= walk_length < 1000
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    rng = e.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "random_walks requires vertex ids in [0, 2^31): the argmin-of-mix"
            " determinism contract does negative-unsafe modular arithmetic"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )
    if starts is None:
        starts = (
            e.select(F.col("src").alias("vertex"))
            .union(e.select(F.col("dst").alias("vertex")))
            .distinct()
        )
    # frontier: (walk_id, cur, smix) with smix = mix(seed, walk_id) folded
    # once so each step only mixes (t, candidate)
    frontier = _truncate(
        starts.select(
            F.col("vertex").cast("long").alias("walk_id"),
            F.col("vertex").cast("long").alias("cur"),
            _mix(F.lit(seed).cast("long"), F.col("vertex").cast("long")).alias(
                "smix"
            ),
        )
    )
    step_outputs: list[DataFrame] = [
        frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))
    ]
    metrics: list[dict] = []
    for t in range(1, walk_length + 1):
        t0 = time.time()
        # candidates: out-neighbors of the current vertex; key is total and
        # tie-free (module docstring), so MIN picks a unique next hop
        cand = e.join(frontier, e.src == frontier.cur).select(
            "walk_id",
            "smix",
            (
                _mix(
                    _mix(_mix(F.col("smix"), F.lit(t).cast("long")), F.col("dst")),
                    F.lit(0).cast("long"),
                )
                * F.lit(_M).cast("long")
                + F.col("dst")
            ).alias("key"),
        )
        nxt = cand.groupBy("walk_id", "smix").agg(F.min("key").alias("k"))
        frontier = _truncate(
            nxt.select(
                "walk_id",
                (F.col("k") % F.lit(_M)).alias("cur"),
                "smix",
            )
        )
        n_alive = frontier.count()
        metrics.append(
            {"step": t, "alive": n_alive, "wall_s": round(time.time() - t0, 4)}
        )
        if n_alive == 0:
            break
        step_outputs.append(
            frontier.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
    e.unpersist()
    corpus = reduce(DataFrame.unionByName, step_outputs)
    return WalkResult(corpus, walk_length, metrics)


def random_walks_single_node(
    pairs: list[tuple[int, int]],
    *,
    walk_length: int = 8,
    seed: int = 42,
    starts: list[int] | None = None,
) -> list[tuple[int, int, int]]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python integer arithmetic)."""
    succ: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for u, v in set(pairs):
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, []).append(v)
    out: list[tuple[int, int, int]] = []
    for w in sorted(nodes) if starts is None else sorted(set(starts)):
        cur = w
        out.append((w, 0, cur))
        smix = (seed * _A + w) % _M
        for t in range(1, walk_length + 1):
            nbrs = succ.get(cur)
            if not nbrs:
                break
            tmix = (smix * _A + t) % _M
            cur = min(
                nbrs,
                key=lambda u: (((tmix * _A + u) % _M) * _A % _M) * _M + u,
            )
            out.append((w, t, cur))
    return out
