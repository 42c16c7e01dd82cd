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

Action budget: TWO scalar actions per iteration, not three. Each half-step's
normalizer is load-bearing (it gates the next half-step), so those two
aggregates are irreducible; the convergence error rides them instead of a
third pass — Σ|Δauth| folds into the hub normalizer's aggregate (the new
auths exist by then), and Σ|Δhub| folds into the NEXT iteration's auth
normalizer (scores carry prev_hub). The convergence test therefore fires at
the top of iteration i+1 over iteration i's movement — the returned scores
and iteration count are IDENTICAL to checking at the bottom of iteration i
(one speculative edge-join aggregate is spent on the final, converged
iteration; one action per iteration is saved on every other).

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

    # scores carries prev_hub so the NEXT auth-normalizer action can fold in
    # Σ|Δhub| of the iteration that produced it (module docstring: two
    # actions per iteration). prev_hub = hub at start ⇒ first fold is 0.
    scores = _truncate(
        verts.select(
            "vertex",
            F.lit(0.0).alias("auth"),
            F.lit(1.0 / n).alias("hub"),
            F.lit(1.0 / n).alias("prev_hub"),
        )
    )

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    a_err_prev: float | None = None  # Σ|Δauth| of the previous iteration
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
        # ONE action: auth normalizer Σ a_raw (absent vertices contribute 0,
        # so the left join changes nothing in the sum) + Σ|Δhub| of the
        # PREVIOUS iteration, now that both hub generations sit in scores
        arow = (
            scores.join(a_contrib, "vertex", "left")
            .agg(
                F.sum(F.coalesce("a_raw", F.lit(0.0))).alias("s"),
                F.sum(F.abs(F.col("hub") - F.col("prev_hub"))).alias("h_err"),
            )
            .collect()[0]
        )
        a_sum = arow["s"] or 0.0
        h_err_prev = arow["h_err"] or 0.0
        if metrics:
            metrics[-1]["l1_err"] = (a_err_prev or 0.0) + h_err_prev
        if (
            fixed_iters is None
            and a_err_prev is not None
            and a_err_prev + h_err_prev < n * tol
        ):
            # iteration it-1's total movement is below tolerance: the scores
            # standing NOW are exactly what the bottom-of-iteration check
            # would have returned
            converged = True
            break
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
        # ONE action: hub normalizer + this iteration's Σ|Δauth| (the new
        # auths exist by now; again the left join preserves the raw sum)
        hrow = (
            auth.join(h_contrib, "vertex", "left")
            .agg(
                F.sum(F.coalesce("h_raw", F.lit(0.0))).alias("s"),
                F.sum(F.abs(F.col("auth") - F.col("old_auth"))).alias("a_err"),
            )
            .collect()[0]
        )
        h_sum = hrow["s"] or 0.0
        a_err_prev = hrow["a_err"] or 0.0
        if h_sum == 0.0:
            # unreachable when a_sum > 0 (positivity propagates along the
            # same edges), but guard anyway: DON'T divide — non-ANSI double
            # division by zero would silently null every hub score
            converged = True
            break
        new_scores = auth.join(h_contrib, "vertex", "left").select(
            "vertex",
            "auth",
            (F.coalesce("h_raw", F.lit(0.0)) / F.lit(h_sum)).alias("hub"),
            F.col("old_hub").alias("prev_hub"),
        )
        new_scores = _truncate(new_scores)
        wall = time.time() - t0
        scores = new_scores
        completed += 1
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "l1_err": None,  # patched by the NEXT iteration's fold
                "a_l1_err": a_err_prev,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(2 * n_edges / wall, 1) if wall > 0 else None,
            }
        )
    if fixed_iters is not None:
        converged = True
    elif not converged and completed > 0:
        # loop exhausted max_iter: the final iteration's Σ|Δhub| was never
        # folded — one closing action decides whether that last movement
        # was already below tolerance (parity with a bottom-of-iteration
        # convergence check)
        h_err_last = (
            scores.agg(
                F.sum(F.abs(F.col("hub") - F.col("prev_hub"))).alias("h")
            ).collect()[0]["h"]
            or 0.0
        )
        metrics[-1]["l1_err"] = (a_err_prev or 0.0) + h_err_last
        converged = (a_err_prev or 0.0) + h_err_last < n * tol
    e_fwd.unpersist()
    e_rev.unpersist()
    out = scores.select(
        F.col("vertex").cast("long").alias("vertex") if packed else F.col("vertex"),
        "auth",
        "hub",
    )
    return HITSResult(out, completed, converged, metrics)


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
