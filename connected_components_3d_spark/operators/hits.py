"""HITS (hubs & authorities): Kleinberg's link-analysis power iteration.

A link-graph engine companion to PageRank (operators/pagerank.py) — same
north-rule family (BASELINE.json category ``link_graph``): iterative
DataFrame joins over a shuffle-once edge layout, float64 throughout.

Semantics (fixed, deterministic — the contract both the single-node oracle
and the DuckDB chained-CTE oracle replay exactly):

  simple-graph: duplicate (src,dst) pairs collapse (DISTINCT)
  V = {src} ∪ {dst};  hub_0[v] = 1/|V|
  iteration i ≥ 1:
    auth_i[v]  = Σ_{u→v} hub_{i-1}[u],   then L1-normalized (÷ Σ_v auth_i)
    hub_i[v]   = Σ_{v→w} auth_i[w],      then L1-normalized (÷ Σ_v hub_i)
  fixed_iters=k runs exactly k iterations (the SQL-oracle parity path);
  otherwise stop when Σ|Δauth| + Σ|Δhub| < |V|·tol.

Scale shape (SURVEY.md §4.3): HITS needs BOTH edge orientations every
iteration (auth aggregates over in-edges keyed by src-side hubs, hubs over
out-edges keyed by dst-side auths), so TWO persisted edge caches are laid
down once — forward hash-partitioned+sorted by src, reversed by dst — and
each iteration's sort-merge join re-sorts only the V-row score side, never
an E-row edge side. Per-iteration shuffle volume is therefore vertex-sized
(partial+final agg output), matching the PageRank kernel's per-iteration
shape at 2× the static cache footprint. Normalization scalars and the
convergence error ride the existing one-action-per-half-step aggregates
(no extra passes). Int-packing mirrors pagerank.py: int32 ids halve the
cache and shuffle key width when the id range allows.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class HITSResult:
    scores: DataFrame  # (vertex:long, auth:double, hub:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def hits(
    spark: SparkSession,
    edges: DataFrame,
    *,
    tol: float = 1.0e-8,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> HITSResult:
    """HITS over the DIRECTED edge table ``(src, dst)``.

    Returns per-vertex L1-normalized authority and hub scores (each column
    sums to 1 whenever the graph has ≥1 edge). ``fixed_iters`` disables the
    convergence test — the driver-gate path where DuckDB replays the same k
    chained iterations and the comparison is hash-exact after ROUND(…, 8).
    """
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rng = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    packed = (
        rng["lo"] is not None
        and rng["lo"] >= -2147483648
        and rng["hi"] <= 2147483647
    )
    if packed:
        edges = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    e = edges.select("src", "dst").distinct()
    # both orientations are hot every iteration — lay each down ONCE
    e_fwd = e.repartition(p, "src").sortWithinPartitions("src").persist()
    e_rev = e.repartition(p, "dst").sortWithinPartitions("dst").persist()
    verts = _truncate(vertices(e_fwd))
    n = verts.count()
    if n == 0:
        empty = verts.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.lit(0.0).alias("auth"),
            F.lit(0.0).alias("hub"),
        )
        return HITSResult(empty, 0, True)
    n_edges = e_fwd.count()
    e_rev.count()

    scores = _truncate(
        verts.select(
            "vertex",
            F.lit(0.0).alias("auth"),
            F.lit(1.0 / n).alias("hub"),
        )
    )

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    it = 0
    for it in range(iters):
        t0 = time.time()
        # auth half-step: in-edge sum of current hubs. Join keys on the
        # PERSISTED src partitioning (only the V-row hub side re-shuffles);
        # the groupBy(dst) agg is partial+final — vertex-sized output.
        a_contrib = (
            e_fwd.join(
                scores.select("vertex", "hub"), e_fwd.src == F.col("vertex")
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        # normalization scalar = Σ a_raw (absent vertices contribute 0);
        # one scalar action per half-step
        a_sum = a_contrib.agg(F.sum("a_raw").alias("s")).collect()[0]["s"] or 0.0
        if a_sum == 0.0:
            # no edge carried mass (possible only on an empty edge set,
            # already handled) — keep scores; declare convergence
            converged = True
            break
        auth = scores.join(a_contrib, "vertex", "left").select(
            "vertex",
            F.col("auth").alias("old_auth"),
            F.col("hub").alias("old_hub"),
            (F.coalesce("a_raw", F.lit(0.0)) / F.lit(a_sum)).alias("auth"),
        )
        auth = _truncate(auth)
        # hub half-step: out-edge sum of NEW auths, over the dst-partitioned
        # reversed cache
        h_contrib = (
            e_rev.join(
                auth.select("vertex", "auth"), e_rev.dst == F.col("vertex")
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum("auth").alias("h_raw"))
        )
        h_sum = h_contrib.agg(F.sum("h_raw").alias("s")).collect()[0]["s"] or 0.0
        new_scores = auth.join(h_contrib, "vertex", "left").select(
            "vertex",
            "old_auth",
            "old_hub",
            "auth",
            (F.coalesce("h_raw", F.lit(0.0)) / F.lit(h_sum)).alias("hub"),
        )
        new_scores = _truncate(new_scores)
        # ONE action closes the iteration: L1 movement of both score vectors
        row = new_scores.agg(
            (
                F.sum(F.abs(F.col("auth") - F.col("old_auth")))
                + F.sum(F.abs(F.col("hub") - F.col("old_hub")))
            ).alias("err")
        ).collect()[0]
        err = row["err"]
        wall = time.time() - t0
        scores = new_scores.select("vertex", "auth", "hub")
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "l1_err": err,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(2 * n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if fixed_iters is None and err < n * tol:
            converged = True
            break
    if fixed_iters is not None:
        converged = True
    e_fwd.unpersist()
    e_rev.unpersist()
    out = (
        scores.select(F.col("vertex").cast("long").alias("vertex"), "auth", "hub")
        if packed
        else scores.select("vertex", "auth", "hub")
    )
    return HITSResult(out, it + 1, converged, metrics)


def hits_single_node(
    pairs: list[tuple[int, int]],
    *,
    tol: float = 1.0e-8,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict[int, tuple[float, float]]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python float64, no numpy needed). networkx
    3.6 delegates ``hits`` to scipy, absent in this sandbox (same situation
    as pagerank_single_node), so the recurrence — public knowledge,
    Kleinberg 1999 — is spelled out here."""
    succ: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, set()).add(v)
    n = len(nodes)
    if n == 0:
        return {}
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 0.0 for v in nodes}
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        a_raw = {v: 0.0 for v in nodes}
        for u, outs in succ.items():
            for v in outs:
                a_raw[v] += hub[u]
        s = sum(a_raw.values())
        if s == 0.0:
            break
        new_auth = {v: a_raw[v] / s for v in nodes}
        h_raw = {v: 0.0 for v in nodes}
        for u, outs in succ.items():
            h_raw[u] = sum(new_auth[v] for v in outs)
        hs = sum(h_raw.values())
        new_hub = {v: h_raw[v] / hs for v in nodes}
        err = sum(abs(new_auth[v] - auth[v]) for v in nodes) + sum(
            abs(new_hub[v] - hub[v]) for v in nodes
        )
        auth, hub = new_auth, new_hub
        if fixed_iters is None and err < n * tol:
            break
    return {v: (auth[v], hub[v]) for v in nodes}
