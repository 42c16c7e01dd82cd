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


# ---------------------------------------------------------------------------
# node2vec: second-order (p, q)-biased walks (Grover & Leskovec, KDD 2016)
# ---------------------------------------------------------------------------

def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    *,
    walk_length: int = 8,
    p: tuple[int, int] = (1, 1),
    q: tuple[int, int] = (1, 1),
    seed: int = 42,
    starts: DataFrame | None = None,
) -> WalkResult:
    """Second-order biased walks — node2vec's (p, q) search strategy
    (Grover & Leskovec, KDD 2016) over the DIRECTED edge table
    ``(src, dst)`` — re-expressed as k chained join + windowed-cumulative-
    weight supersteps. ``p``/``q`` are RATIONALS given as (num, den) int
    pairs so the whole contract stays integer-exact and DuckDB-replayable.

    Determinism contract (fixed — ``node2vec_walks_single_node`` and the
    ``node2vec_tree`` chained-CTE gate oracle replay it bit-for-bit). A walk
    at step t stands on ``cur`` having arrived from ``prev``. Each
    out-neighbor u of ``cur`` gets the classic node2vec class weight,
    cleared of fractions by the common multiplier p_num·q_num:

        w(u) = p_den·q_num   if u = prev            (return,   ∝ 1/p)
             = p_num·q_num   if edge prev→u exists  (in-ring,  ∝ 1)
             = p_num·q_den   otherwise              (outward,  ∝ 1/q)

    Step 1 has no ``prev`` — every candidate weighs 1 (the uniform first
    hop node2vec starts with). The next hop is chosen by EXACT categorical
    sampling over those integer weights: order candidates by u ascending,
    take cumulative weights cum(u), and pick the unique u with

        cum(u) − w(u) ≤ r < cum(u),
        r = (mix3(s,t,0)·M + mix3(s,t,1)) % W,   W = Σ w(u),
        mix3(s,t,j) = mix(mix(s,t), j),  s = mix(seed, walk_id)

    — a 62-bit uniform key reduced mod the walk's total weight, so the
    selection is exactly proportional to the node2vec weights (up to the
    negligible % W bias) yet byte-replayable: all arithmetic is BIGINT with
    every intermediate < 2^63 (M² − 1 ≈ 4.6e18), identical in Spark and
    DuckDB. Requires vertex ids in [0, 2^31) and p/q components in
    [1, 10^4] (asserted) so W ≤ deg·10^8 stays far under 2^62.

    Scale shape: the adjacency is laid down once (hash-partitioned + sorted
    by src, persisted); each step does (1) a frontier×adjacency join to
    enumerate candidates, (2) for t ≥ 2 a candidate×adjacency join on
    (prev, u) to mark the in-ring class — the price of second-order bias,
    both joins against the SAME persisted layout — and (3) a per-walk
    window (partition key = walk_id; partition size = out-degree of one
    vertex) for the cumulative pick. No edge-sized shuffle beyond the two
    candidate joins; frontier state is localCheckpointed per step.
    """
    p_num, p_den = p
    q_num, q_den = q
    assert 0 <= seed < _M and 1 <= walk_length < 1000
    for x in (p_num, p_den, q_num, q_den):
        assert isinstance(x, int) and 1 <= x <= 10_000, (
            "p/q must be (num, den) int pairs in [1, 10^4]"
        )
    from pyspark.sql import Window

    w_ret = p_den * q_num
    w_in = p_num * q_num
    w_out = p_num * q_den
    part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition(part, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    rng = e.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] >= _M):
        raise ValueError(
            "node2vec_walks requires vertex ids in [0, 2^31): the mix-based"
            " determinism contract does negative-unsafe modular arithmetic"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )
    if starts is None:
        starts = (
            e.select(F.col("src").alias("vertex"))
            .union(e.select(F.col("dst").alias("vertex")))
            .distinct()
        )
    # frontier: (walk_id, prev, cur, smix); prev = -1 before the first hop
    frontier = _truncate(
        starts.select(
            F.col("vertex").cast("long").alias("walk_id"),
            F.lit(-1).cast("long").alias("prev"),
            F.col("vertex").cast("long").alias("cur"),
            _mix(F.lit(seed).cast("long"), F.col("vertex").cast("long")).alias(
                "smix"
            ),
        )
    )
    step_outputs: list[DataFrame] = [
        frontier.select(
            "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
        )
    ]
    metrics: list[dict] = []
    win_cum = (
        Window.partitionBy("walk_id")
        .orderBy("u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_tot = Window.partitionBy("walk_id")
    for t in range(1, walk_length + 1):
        t0 = time.time()
        cand = e.join(frontier, e.src == frontier.cur).select(
            "walk_id", "smix", "prev", "cur", F.col("dst").alias("u")
        )
        if t == 1:
            cand = cand.withColumn("w", F.lit(1).cast("long"))
        else:
            pe = e.select(
                F.col("src").alias("p_s"),
                F.col("dst").alias("p_d"),
                F.lit(1).alias("has_pe"),
            )
            cand = (
                cand.join(
                    pe,
                    (cand.prev == pe.p_s) & (cand.u == pe.p_d),
                    "left",
                )
                .withColumn(
                    "w",
                    F.when(F.col("u") == F.col("prev"), F.lit(w_ret))
                    .when(F.col("has_pe").isNotNull(), F.lit(w_in))
                    .otherwise(F.lit(w_out))
                    .cast("long"),
                )
                .drop("p_s", "p_d", "has_pe")
            )
        r = (
            _mix(_mix(F.col("smix"), F.lit(t).cast("long")), F.lit(0).cast("long"))
            * F.lit(_M).cast("long")
            + _mix(_mix(F.col("smix"), F.lit(t).cast("long")), F.lit(1).cast("long"))
        ) % F.sum("w").over(win_tot)
        picked = (
            cand.withColumn("cum", F.sum("w").over(win_cum))
            .withColumn("r", r)
            .where(
                (F.col("r") >= F.col("cum") - F.col("w"))
                & (F.col("r") < F.col("cum"))
            )
        )
        frontier = _truncate(
            picked.select(
                "walk_id",
                F.col("cur").alias("prev"),
                F.col("u").alias("cur"),
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


def node2vec_walks_single_node(
    pairs: list[tuple[int, int]],
    *,
    walk_length: int = 8,
    p: tuple[int, int] = (1, 1),
    q: tuple[int, int] = (1, 1),
    seed: int = 42,
    starts: list[int] | None = None,
) -> list[tuple[int, int, int]]:
    """Single-node reference for ``node2vec_walks`` — the pytest parity
    oracle (same contract as the operator docstring; pure Python ints)."""
    p_num, p_den = p
    q_num, q_den = q
    w_ret, w_in, w_out = p_den * q_num, p_num * q_num, p_num * q_den
    succ: dict[int, list[int]] = {}
    eset: set[tuple[int, int]] = set(pairs)
    nodes: set[int] = set()
    for u, v in eset:
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, []).append(v)
    for vs in succ.values():
        vs.sort()
    out: list[tuple[int, int, int]] = []
    for wid in sorted(nodes) if starts is None else sorted(set(starts)):
        prev, cur = -1, wid
        out.append((wid, 0, cur))
        smix = (seed * _A + wid) % _M
        for t in range(1, walk_length + 1):
            nbrs = succ.get(cur)
            if not nbrs:
                break
            if t == 1:
                ws = [1] * len(nbrs)
            else:
                ws = [
                    w_ret
                    if u == prev
                    else (w_in if (prev, u) in eset else w_out)
                    for u in nbrs
                ]
            tmix = (smix * _A + t) % _M
            r = ((tmix * _A) % _M * _M + (tmix * _A + 1) % _M) % sum(ws)
            cum = 0
            for u, wgt in zip(nbrs, ws):
                cum += wgt
                if r < cum:
                    nxt = u
                    break
            prev, cur = cur, nxt
            out.append((wid, t, cur))
    return out
