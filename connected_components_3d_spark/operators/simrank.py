"""SimRank — the structural-context similarity of Jeh & Widom (KDD 2002
"SimRank: a measure of structural-context similarity"): two pages are
similar when they are pointed to by similar pages,

    s(a,a) = 1
    s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)

over in-neighborhoods I(·), decay C ∈ (0,1); s(a,b) = 0 when either side
has no in-neighbors. The random-surfer-pairs reading: s(a,b) is the
C-discounted expected meeting time of two backward walks started at a and
b. Completes the link-similarity suite next to co-citation (its 1-step
truncation, operators/cocitation.py) and the neighborhood-overlap indices
(operators/linkpred.py).

Semantics (fixed, deterministic — replayed by the single-node reference,
the networkx ``simrank_similarity`` pytest parity, and the DuckDB
chained-CTE gate oracles ``simrank_ring`` / ``simrank_tree``):

  simple-graph: duplicate (src,dst) pairs collapse (DISTINCT)
  V = {src} ∪ {dst};  s_0 = identity (diagonal 1)
  iteration k ≥ 1 applies the recurrence above with s_{k-1} on the right;
  ``fixed_iters=k`` yields exactly the k-step truncated SimRank (the
  SQL-oracle parity path, hash-exact after ROUND(…,8)).

Output is the SPARSE strict-upper-triangle: only pairs a < b with
s_k(a,b) > 0 (SimRank is symmetric, the diagonal is identically 1, and
zero pairs — different backward-reachability strata — are absent).

Scale shape: state is the sparse pair table (i, j, score) kept in BOTH
orders plus the diagonal so each superstep is two sort-merge joins against
one persisted src-partitioned+sorted out-edge cache (i→a then j→b), a
(a,b)-keyed partial+final sum, and two broadcast-sized in-degree joins.
Honest scale note: all-pairs SimRank is inherently Ω(pairs) — the sparse
frontier grows with k as same-length backward co-reachability widens, so
the web-scale recipe is SMALL fixed k (1–3, the truncation users actually
deploy) plus the opt-in ``max_out_degree`` hub cap, which bounds the
per-superstep fan-out |S_k|·deg(i)·deg(j) exactly like linkpred.py's hub
cap (deterministic xxhash64 bottom-k per source, so a re-run picks the
same edges). Per-iteration persist + count truncates lineage (the cc.py
superstep discipline).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class SimRankResult:
    similarities: DataFrame  # (a: long, b: long, score: double), a < b
    num_iters: int
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def simrank(
    spark: SparkSession,
    edges: DataFrame,
    *,
    c: float = 0.8,
    fixed_iters: int = 3,
    max_out_degree: int | None = None,
) -> SimRankResult:
    """k-step truncated SimRank over the DIRECTED edge table ``(src, dst)``.

    ``max_out_degree`` (opt-in) deterministically keeps the bottom-k
    out-edges per source by xxhash64 — the hub-cap scale lever; None = exact.
    """
    if not 0.0 < c < 1.0:
        raise ValueError(f"simrank: c must be in (0,1), got {c}")
    if fixed_iters < 1:
        raise ValueError(f"simrank: fixed_iters must be >= 1, got {fixed_iters}")
    if max_out_degree is not None and max_out_degree < 1:
        raise ValueError(
            f"simrank: max_out_degree must be >= 1, got {max_out_degree}"
        )
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
    )
    if max_out_degree is not None:
        w = Window.partitionBy("src").orderBy(F.xxhash64("src", "dst"), "dst")
        e = (
            e.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_out_degree)
            .drop("_rn")
        )
    e_fwd = e.repartition(p, "src").sortWithinPartitions("src").persist()
    verts = _truncate(vertices(e_fwd))
    n = verts.count()
    empty = verts.select(
        F.col("vertex").alias("a"),
        F.col("vertex").alias("b"),
        F.lit(0.0).alias("score"),
    ).limit(0)
    if n == 0:
        e_fwd.unpersist()
        return SimRankResult(empty, 0)

    # in-degrees AFTER the cap (the capped graph is the graph we score)
    indeg = _truncate(e_fwd.groupBy(F.col("dst").alias("vertex")).count())

    diag = verts.select(
        F.col("vertex").alias("i"),
        F.col("vertex").alias("j"),
        F.lit(1.0).alias("score"),
    )
    # state = diagonal ∪ both-orders off-diagonal (empty at k=0)
    state = _truncate(diag)
    metrics: list[dict] = []
    for it in range(fixed_iters):
        t0 = time.time()
        prop = (
            state.join(e_fwd, state.i == e_fwd.src)
            .select(F.col("dst").alias("a"), "j", "score")
            .join(e_fwd, F.col("j") == e_fwd.src)
            .select("a", F.col("dst").alias("b"), "score")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("score").alias("s"))
            .join(indeg.select(F.col("vertex").alias("a"), F.col("count").alias("ia")), "a")
            .join(indeg.select(F.col("vertex").alias("b"), F.col("count").alias("ib")), "b")
            .select(
                F.col("a").alias("i"),
                F.col("b").alias("j"),
                (F.lit(float(c)) * F.col("s") / (F.col("ia") * F.col("ib"))).alias(
                    "score"
                ),
            )
        )
        nxt = _truncate(diag.unionByName(prop))
        pairs = nxt.count()  # action: materialize + truncate lineage
        state.unpersist()
        state = nxt
        metrics.append(
            {"iter": it + 1, "pairs": int(pairs), "sec": time.time() - t0}
        )
    out = (
        state.filter(F.col("i") < F.col("j"))
        .select(F.col("i").alias("a"), F.col("j").alias("b"), "score")
    )
    e_fwd.unpersist()
    return SimRankResult(out, fixed_iters, metrics)


def simrank_single_node(
    edge_list: list[tuple[int, int]], c: float, k: int
) -> dict[tuple[int, int], float]:
    """Textbook Jeh–Widom recurrence on python dicts — the pytest oracle
    (same role as hits_single_node / ppr_single_node)."""
    verts: set[int] = set()
    inn: dict[int, set[int]] = {}
    for s, d in set(edge_list):
        verts.add(s)
        verts.add(d)
        inn.setdefault(d, set()).add(s)
    sim = {(v, v): 1.0 for v in verts}
    for _ in range(k):
        new = {(v, v): 1.0 for v in verts}
        for a in verts:
            for b in verts:
                if a == b or not inn.get(a) or not inn.get(b):
                    continue
                t = sum(
                    sim.get((i, j), 0.0) for i in inn[a] for j in inn[b]
                )
                if t:
                    new[(a, b)] = c * t / (len(inn[a]) * len(inn[b]))
        sim = new
    return sim
