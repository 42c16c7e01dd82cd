"""Balanced k-way graph partitioning — Spinner-style label-propagation
partitioning (Martella, Logothetis, Loukas, Siganos: "Spinner: Scalable
Graph Partitioning in the Cloud", ICDE 2017) re-expressed as fixed
deterministic DataFrame supersteps. THE operator a 100 TB link-graph
deployment runs FIRST: compute vertex → partition once, write the edge
table bucketed by it, and every downstream iterative kernel (CC / PageRank
/ LPA; SURVEY.md §4.3 O14) inherits a layout whose cross-partition edge
traffic — the per-superstep shuffle — is minimized subject to balance.

Determinism contract (fixed — ``balanced_partitioning_single_node`` and
the ``partition_cliques`` chained-CTE DuckDB gate oracle replay it
bit-for-bit). The graph is symmetrized and self-loops dropped; vertex ids
must lie in [0, 2^31). With k parts, V vertices, integer capacity
C = ⌈slack · V / k⌉ (slack a (num, den) rational, default 21/20 = 1.05):

  init:     part_0(v) = mix(seed, v) % k,  mix(a,b) = (a·1103515245 + b) % M
  round r:  n(v,c) = |{u ∈ N(v) : part_{r-1}(u) = c}|
            L(c)   = |{v : part_{r-1}(v) = c}|       (k-row broadcast side)
            score(v,c) = n(v,c) · C + deg(v) · (C − L(c))

— Spinner's score  n(v,c)/deg(v) + (1 − L(c)/C)  scaled by the per-vertex
constant deg(v)·C, so the argmax is identical but every term is a BIGINT
(score ≤ 4V² < 2^62 for V < 2^30, asserted). Candidate parts are the parts
of v's neighbors plus v's current part; v adopts the candidate maximizing
score (ties → smaller part id) iff that strictly beats its current part's
score, and only on its parity turn ((v + r) % 2 = 0) — the same
deterministic anti-oscillation device as operators/louvain.py's sweeps
(two adjacent vertices can otherwise swap parts forever). Capacity is
SOFT, exactly as in Spinner: the deg·(C − L) term makes overloaded parts
progressively unattractive; the balance tests pin the resulting loads.

Scale shape: per round (1) one edge-sized join of the src-sorted persisted
adjacency against the previous assignment + a (v, c)-keyed count — the one
edge-sized shuffle, (2) a k-row load aggregate collected to the driver
(scalars only) and rebroadcast as literals via a CASE column, (3) a
vertex-sized argmax groupBy (MIN over struct(−score, c)) and a vertex-sized
join against the previous assignment for the strictly-better / parity
gate. The assignment is localCheckpointed per round (flat lineage). The
final edge-cut metric is one extra edge-sized join, computed once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2147483647
_A = 1103515245


@dataclass
class PartitioningResult:
    # (vertex:long, part:int)
    assignment: DataFrame
    k: int
    capacity: int
    edge_cut: int  # undirected edges whose endpoints land in different parts
    loads: dict[int, int]  # part -> vertex count, final round
    metrics: list[dict] = field(default_factory=list)


def _mix(a, b):
    return (a * F.lit(_A).cast("long") + b) % F.lit(_M).cast("long")


def balanced_partitioning(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    *,
    fixed_rounds: int = 5,
    slack: tuple[int, int] = (21, 20),
    seed: int = 42,
) -> PartitioningResult:
    """Spinner-style balanced k-way partitioning of the undirected graph
    underlying the DIRECTED edge table ``(src, dst)`` — see module
    docstring for the exact deterministic contract."""
    s_num, s_den = slack
    assert 2 <= k <= 1024 and 1 <= fixed_rounds <= 100
    assert 0 <= seed < _M
    assert 1 <= s_den <= s_num <= 4 * s_den, "slack must be in [1, 4]"
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    sym = (
        e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    rng = sym.agg(
        F.min("src").alias("lo"), F.max("src").alias("hi")
    ).collect()[0]
    if rng["lo"] is None:
        sym.unpersist()
        empty = spark.createDataFrame([], "vertex long, part int")
        return PartitioningResult(empty, k, 0, 0, {}, [])
    if rng["lo"] < 0 or rng["hi"] >= 2**30:
        raise ValueError(
            "balanced_partitioning requires vertex ids in [0, 2^30): the"
            " integer score contract needs n·C + deg·C < 2^62"
            f" (got range [{rng['lo']}, {rng['hi']}])"
        )
    deg = sym.groupBy(F.col("src").alias("vertex")).agg(
        F.count("*").alias("deg")
    )
    n_verts = deg.count()
    cap = -(-s_num * n_verts // (s_den * k))  # ceil(slack * V / k)
    assign = deg.select(
        "vertex",
        (_mix(F.lit(seed).cast("long"), F.col("vertex")) % F.lit(k))
        .cast("int")
        .alias("part"),
    ).localCheckpoint(eager=True)
    metrics: list[dict] = []
    loads: dict[int, int] = {}
    for r in range(1, fixed_rounds + 1):
        t0 = time.time()
        load_rows = assign.groupBy("part").count().collect()
        loads = {int(row["part"]): int(row["count"]) for row in load_rows}
        load_col = F.coalesce(
            *(
                [
                    F.when(F.col("c") == c, F.lit(n).cast("long"))
                    for c, n in sorted(loads.items())
                ]
                + [F.lit(0).cast("long")]
            )
        )
        # neighbor-part counts: the one edge-sized shuffle of the round
        nbr = (
            sym.join(
                assign.select(
                    F.col("vertex").alias("dst"), F.col("part").alias("c")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vertex"), "c")
            .agg(F.count("*").alias("n"))
        )
        # candidates = neighbor parts ∪ current part (n = 0 if no neighbor)
        cur = assign.select("vertex", F.col("part").alias("c"))
        cand = (
            nbr.join(cur.withColumn("is_cur", F.lit(1)), ["vertex", "c"], "full")
            .withColumn("n", F.coalesce("n", F.lit(0).cast("long")))
            .join(deg, "vertex")
            .withColumn("load", load_col)
            .withColumn(
                "score",
                F.col("n") * F.lit(cap).cast("long")
                + F.col("deg")
                * (F.lit(cap).cast("long") - F.col("load")),
            )
        )
        best = cand.groupBy("vertex").agg(
            F.min(F.struct((-F.col("score")).alias("ns"), F.col("c"))).alias(
                "b"
            ),
            F.max(
                F.when(F.col("is_cur") == 1, F.col("score"))
            ).alias("cur_score"),
        )
        assign = (
            best.join(assign, "vertex")
            .select(
                "vertex",
                F.when(
                    ((F.col("vertex") + F.lit(r)) % 2 == 0)
                    & (-F.col("b.ns") > F.col("cur_score")),
                    F.col("b.c"),
                )
                .otherwise(F.col("part"))
                .cast("int")
                .alias("part"),
            )
            .localCheckpoint(eager=True)
        )
        metrics.append({"round": r, "wall_s": round(time.time() - t0, 4)})
    final_loads = {
        int(row["part"]): int(row["count"])
        for row in assign.groupBy("part").count().collect()
    }
    cut = (
        sym.where(F.col("src") < F.col("dst"))
        .join(
            assign.select(
                F.col("vertex").alias("src"), F.col("part").alias("ps")
            ),
            "src",
        )
        .join(
            assign.select(
                F.col("vertex").alias("dst"), F.col("part").alias("pd")
            ),
            "dst",
        )
        .where(F.col("ps") != F.col("pd"))
        .count()
    )
    sym.unpersist()
    return PartitioningResult(assign, k, cap, cut, final_loads, metrics)


def balanced_partitioning_single_node(
    pairs: list[tuple[int, int]],
    k: int = 4,
    *,
    fixed_rounds: int = 5,
    slack: tuple[int, int] = (21, 20),
    seed: int = 42,
) -> dict[int, int]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python ints)."""
    s_num, s_den = slack
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return {}
    n_verts = len(adj)
    cap = -(-s_num * n_verts // (s_den * k))
    part = {v: ((seed * _A + v) % _M) % k for v in adj}
    for r in range(1, fixed_rounds + 1):
        load: dict[int, int] = {}
        for c in part.values():
            load[c] = load.get(c, 0) + 1
        new = {}
        for v, nbrs in adj.items():
            n: dict[int, int] = {}
            for u in nbrs:
                n[part[u]] = n.get(part[u], 0) + 1
            cands = set(n) | {part[v]}
            d = len(nbrs)

            def score(c):
                return n.get(c, 0) * cap + d * (cap - load.get(c, 0))

            best = min(cands, key=lambda c: (-score(c), c))
            if (v + r) % 2 == 0 and score(best) > score(part[v]):
                new[v] = best
            else:
                new[v] = part[v]
        part = new
    return part
