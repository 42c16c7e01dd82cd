"""Deterministic multi-hop neighbor sampling (GraphSAGE / DGL-style
minibatch fanout sampling): the subgraph-producing step of distributed GNN
training over a web-scale edge table — for every seed vertex, sample at most
``fanout[h]`` out-neighbors per frontier vertex at hop h, hop by hop.

Determinism contract (the single-node oracle and the DuckDB chained-CTE
gate oracle replay it bit-for-bit): the adjacency is first given a dense
per-source neighbor index

    idx(v, u) = ROW_NUMBER() OVER (PARTITION BY v ORDER BY u) - 1,
    deg(v)    = COUNT(*) per source

(distinct edges, so the ordering is total and both engines agree). At hop h
(1-based), frontier vertex v, sample slot j in [0, fanout[h-1]), the chosen
neighbor is the one at index

    pick(h, v, j) = mix(mix(mix(seed, h), v), j) % deg(v)
    mix(a, b)     = (a * 1103515245 + b) % M,   M = 2147483647

— the same LCG-style integer mix as operators/walks.py (every intermediate
< 2^31, every product < 2^62; literals long-cast so ANSI-mode constant
folding never sees a 32-bit overflow), so Spark and DuckDB compute the
identical value. Sampling is uniform WITH replacement (the DGL
``sample_neighbors`` default); the emitted block is deduplicated per
(hop, src, dst), so a slot collision just yields fewer than ``fanout`` rows
for that vertex — callers needing exact-k should over-sample. The next
frontier is the distinct set of sampled destinations.

Scale shape: the neighbor index is built ONCE per input (a per-src window —
the one skewed pass, paid at layout time exactly like the O7 sorted
persisted edge cache, then reused by every hop and every minibatch); each
hop then generates frontier x fanout candidate rows via an exploded slot
sequence (frontier-sized, never edge-sized) and equi-joins them to the
indexed adjacency on (src, idx) — a co-partitioned hash join whose build
side is the candidate table. No windows, no per-row Python, no driver-side
data collects inside the hop loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


@dataclass
class SampleResult:
    # (hop:int, src:long, dst:long) — hop is 1-based; distinct per
    # (hop, src, dst); src at hop h is a member of frontier h-1
    blocks: DataFrame
    fanouts: list[int]
    metrics: list[dict] = field(default_factory=list)


def _mix(a, b):
    """(a * A + b) % M on BIGINT columns — literals long-cast (walks.py
    rationale: ANSI constant folding must never run in 32-bit ints)."""
    return (a * F.lit(_A).cast("long") + b) % F.lit(_M).cast("long")


def neighbor_sample(
    spark: SparkSession,
    edges: DataFrame,
    fanouts: list[int],
    *,
    seed: int = 42,
    starts: DataFrame | None = None,
) -> SampleResult:
    """Multi-hop deterministic neighbor sampling over the DIRECTED edge
    table ``(src, dst)`` per the module-docstring contract. ``fanouts[h-1]``
    is the per-vertex sample budget at hop h; ``starts`` optionally
    restricts the seed set (a ``vertex`` column; default: every source
    vertex). Returns the sampled message-flow blocks as (hop, src, dst)."""
    assert fanouts and all(1 <= f < 1000 for f in fanouts)
    assert 0 <= seed < _M
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    # one-time indexed adjacency (src, idx, dst) hash-partitioned by src —
    # the layout every hop's (src, idx) equi-join reuses — plus the V-sized
    # degree table the slot→index modulo needs (kept separate so candidate
    # rows join V rows, not E rows)
    adj = (
        e.withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
        )
        .repartition(p, "src")
        .persist()
    )
    degs = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    rng = adj.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        adj.unpersist()
        degs.unpersist()
        raise ValueError(
            "neighbor_sample requires vertex ids in [0, 2^31): the pick-index"
            " determinism contract does negative-unsafe modular arithmetic"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )
    if starts is None:
        frontier = adj.select(F.col("src").alias("vertex")).distinct()
    else:
        frontier = starts.select(F.col("vertex").cast("long")).distinct()
    frontier = frontier.localCheckpoint(eager=True)

    blocks: list[DataFrame] = []
    metrics: list[dict] = []
    for h, fan in enumerate(fanouts, start=1):
        t0 = time.time()
        hmix = _mix(F.lit(seed).cast("long"), F.lit(h).cast("long"))
        cand = (
            frontier.select(
                F.col("vertex").alias("src"),
                F.explode(F.sequence(F.lit(0), F.lit(fan - 1))).alias("j"),
            )
            .select(
                "src",
                _mix(_mix(hmix, F.col("src")), F.col("j").cast("long")).alias(
                    "pickmix"
                ),
            )
            .join(degs, "src")  # V-sized side; frontier x fanout rows
            .select("src", (F.col("pickmix") % F.col("deg")).alias("idx"))
        )
        picked = (
            cand.join(adj, ["src", "idx"])  # co-partitioned (src, idx) equi-join
            .select(F.lit(h).alias("hop"), "src", "dst")
            .distinct()
        )
        picked = picked.localCheckpoint(eager=True)
        blocks.append(picked)
        frontier = picked.select(F.col("dst").alias("vertex")).distinct()
        frontier = frontier.localCheckpoint(eager=True)
        n = frontier.count()
        metrics.append(
            {"hop": h, "frontier": n, "wall_s": round(time.time() - t0, 4)}
        )
        if n == 0:
            break
    adj.unpersist()
    degs.unpersist()
    out = reduce(DataFrame.unionByName, blocks)
    return SampleResult(out, list(fanouts), metrics)


def neighbor_sample_single_node(
    pairs: list[tuple[int, int]],
    fanouts: list[int],
    *,
    seed: int = 42,
    starts: list[int] | None = None,
) -> list[tuple[int, int, int]]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python integer arithmetic)."""
    succ: dict[int, list[int]] = {}
    for u, v in set(pairs):
        succ.setdefault(u, []).append(v)
    for u in succ:
        succ[u].sort()
    frontier = sorted(succ) if starts is None else sorted(set(starts))
    out: set[tuple[int, int, int]] = set()
    for h, fan in enumerate(fanouts, start=1):
        hmix = (seed * _A + h) % _M
        nxt: set[int] = set()
        for v in frontier:
            nbrs = succ.get(v)
            if not nbrs:
                continue
            vmix = (hmix * _A + v) % _M
            for j in range(fan):
                u = nbrs[((vmix * _A + j) % _M) % len(nbrs)]
                out.add((h, v, u))
                nxt.add(u)
        frontier = sorted(nxt)
        if not frontier:
            break
    return sorted(out)
