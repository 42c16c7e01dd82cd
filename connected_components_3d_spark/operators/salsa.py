"""SALSA (Stochastic Approach for Link-Structure Analysis), Lempel & Moran
2000 — the degree-normalized cousin of HITS used by production web/social
ranking systems (e.g. the who-to-follow literature builds on it).

Semantics (fixed, deterministic — the contract the DuckDB chained-CTE
oracle and the single-node pytest oracle replay exactly):

  simple-graph: duplicate (src,dst) pairs collapse (DISTINCT)
  H = {u : outdeg(u) > 0}   (hub side)     h_0[u] = 1/|H|
  A = {v : indeg(v)  > 0}   (authority side) a_0[v] = 1/|A|
  iteration i ≥ 1, two independent Markov chains:
    authority chain (backward-forward walk on A):
      t_i[u]  = Σ_{u→j} a_{i-1}[j] / indeg(j)      (step back to a hub)
      a_i[k]  = Σ_{i→k} t_i[i] / outdeg(i)         (step forward again)
    hub chain (forward-backward walk on H):
      s_i[j]  = Σ_{i→j} h_{i-1}[i] / outdeg(i)     (step forward to an auth)
      h_i[u]  = Σ_{u→j} s_i[j] / indeg(j)          (step back again)
  Vertices outside A keep auth = 0; outside H keep hub = 0.

Both chains are column-stochastic on their support sets, so L1 mass is
preserved EXACTLY — no per-iteration normalizer is needed, which is the key
structural difference from HITS: with ``fixed_iters`` the loop runs ZERO
scalar actions per iteration (localCheckpoint truncation is the only job),
vs HITS' two irreducible normalizer actions. Convergence mode (tol) adds
one Σ|Δ| action per iteration.

Scale shape (mirrors operators/hits.py): both edge orientations are hot
every iteration, so two persisted caches are laid down once — forward
hash-partitioned+sorted by src, reversed by dst — each carrying the
precomputed reciprocal degree weights (w_out = 1/outdeg(src), w_in =
1/indeg(dst)), so no per-iteration degree join exists. Each of the four
half-steps is one sort-merge join (V-row score side re-shuffles, E-row edge
side never moves) + one partial+final agg — per-iteration shuffle volume is
vertex-sized. Int-packing mirrors pagerank.py. The well-known fixpoint
(auth ∝ indeg within each authority-connected component) is NOT hardcoded:
the power iteration is the operator, so ``fixed_iters`` snapshots are
well-defined on disconnected graphs too.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class SALSAResult:
    scores: DataFrame  # (vertex:long, auth:double, hub:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    *,
    tol: float = 1.0e-8,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> SALSAResult:
    """SALSA over the DIRECTED edge table ``(src, dst)``.

    Returns per-vertex authority and hub scores; each column sums to 1 over
    its support set (auth over vertices with indeg>0, hub over outdeg>0)
    whenever the graph has ≥1 edge. ``fixed_iters`` is the driver-gate path
    (DuckDB replays the same k chained iterations, hash-exact after
    ROUND(…, 8))."""
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
    od = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    idg = e.groupBy("dst").agg(F.count("*").alias("indeg"))
    # reciprocal weights ride the static caches — no per-iteration deg join
    ew = (
        e.join(od, "src")
        .join(idg, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("outdeg")).alias("w_out"),
            (F.lit(1.0) / F.col("indeg")).alias("w_in"),
        )
    )
    e_fwd = ew.repartition(p, "src").sortWithinPartitions("src").persist()
    e_rev = ew.repartition(p, "dst").sortWithinPartitions("dst").persist()
    verts = _truncate(vertices(e_fwd))
    if verts.count() == 0:
        empty = verts.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.lit(0.0).alias("auth"),
            F.lit(0.0).alias("hub"),
        )
        return SALSAResult(empty, 0, True)
    n_edges = e_fwd.count()
    e_rev.count()
    n_hub = od.count()
    n_auth = idg.count()

    # support-set indicators + uniform starts; vertices outside a support
    # set stay at exactly 0.0 through every iteration
    scores = _truncate(
        verts.join(od.select(F.col("src").alias("vertex")).withColumn("_h", F.lit(1)), "vertex", "left")
        .join(idg.select(F.col("dst").alias("vertex")).withColumn("_a", F.lit(1)), "vertex", "left")
        .select(
            "vertex",
            F.when(F.col("_a").isNotNull(), 1.0 / n_auth).otherwise(0.0).alias("auth"),
            F.when(F.col("_h").isNotNull(), 1.0 / n_hub).otherwise(0.0).alias("hub"),
        )
    )

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    for it in range(iters):
        t0 = time.time()
        # authority chain, step 1: t[u] = Σ_{u→j} a[j]·w_in  (dst-side join
        # on the reversed cache; groupBy src → hub-keyed intermediate)
        t_mid = (
            e_rev.join(
                scores.select(F.col("vertex").alias("dst"), "auth"), "dst"
            )
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum(F.col("auth") * F.col("w_in")).alias("t"))
        )
        # authority chain, step 2: a'[k] = Σ_{i→k} t[i]·w_out
        a_new = (
            e_fwd.join(t_mid.select(F.col("vertex").alias("src"), "t"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("t") * F.col("w_out")).alias("a_raw"))
        )
        # hub chain, step 1: s[j] = Σ_{i→j} h[i]·w_out (src-side join)
        s_mid = (
            e_fwd.join(
                scores.select(F.col("vertex").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("hub") * F.col("w_out")).alias("s"))
        )
        # hub chain, step 2: h'[u] = Σ_{u→j} s[j]·w_in
        h_new = (
            e_rev.join(s_mid.select(F.col("vertex").alias("dst"), "s"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.sum(F.col("s") * F.col("w_in")).alias("h_raw"))
        )
        new_scores = (
            scores.join(a_new, "vertex", "left")
            .join(h_new, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("a_raw", F.lit(0.0)).alias("auth"),
                F.coalesce("h_raw", F.lit(0.0)).alias("hub"),
                F.col("auth").alias("prev_auth"),
                F.col("hub").alias("prev_hub"),
            )
        )
        new_scores = _truncate(new_scores)
        if fixed_iters is None:
            err = (
                new_scores.agg(
                    F.sum(
                        F.abs(F.col("auth") - F.col("prev_auth"))
                        + F.abs(F.col("hub") - F.col("prev_hub"))
                    ).alias("e")
                ).collect()[0]["e"]
                or 0.0
            )
        else:
            err = None
        scores = new_scores.select("vertex", "auth", "hub")
        completed += 1
        wall = time.time() - t0
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "l1_err": err,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(4 * n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if fixed_iters is None and err < (n_hub + n_auth) * tol:
            converged = True
            break
    if fixed_iters is not None:
        converged = True
    e_fwd.unpersist()
    e_rev.unpersist()
    out = scores.select(
        F.col("vertex").cast("long").alias("vertex") if packed else F.col("vertex"),
        "auth",
        "hub",
    )
    return SALSAResult(out, completed, converged, metrics)


def salsa_single_node(
    pairs: list[tuple[int, int]],
    *,
    fixed_iters: int = 5,
) -> dict[int, tuple[float, float]]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python float64). networkx has no SALSA;
    the recurrence — public knowledge, Lempel & Moran 2000 — is spelled
    out here."""
    E = sorted(set(pairs))
    nodes = sorted({u for u, _ in E} | {v for _, v in E})
    succ: dict[int, list[int]] = {}
    pred: dict[int, list[int]] = {}
    for u, v in E:
        succ.setdefault(u, []).append(v)
        pred.setdefault(v, []).append(u)
    hubs = sorted(succ)
    auths = sorted(pred)
    if not nodes:
        return {}
    od = {u: len(vs) for u, vs in succ.items()}
    idg = {v: len(us) for v, us in pred.items()}
    a = {v: (1.0 / len(auths) if v in idg else 0.0) for v in nodes}
    h = {v: (1.0 / len(hubs) if v in od else 0.0) for v in nodes}
    for _ in range(fixed_iters):
        t = {
            u: sum(a[j] / idg[j] for j in succ[u]) for u in hubs
        }
        a_new = {v: 0.0 for v in nodes}
        for u in hubs:
            for k in succ[u]:
                a_new[k] += t[u] / od[u]
        s = {
            j: sum(h[i] / od[i] for i in pred[j]) for j in auths
        }
        h_new = {v: 0.0 for v in nodes}
        for j in auths:
            for u in pred[j]:
                h_new[u] += s[j] / idg[j]
        a, h = a_new, h_new
    return {v: (a[v], h[v]) for v in nodes}
