"""Betweenness centrality — batched multi-source Brandes (2001): the
standard "which pages sit on the most shortest paths" centrality, exact
when sourced from every vertex and the textbook sampled estimator when
sourced from a subset (Brandes–Pich 2007 / Bader et al.: sampling sources
is THE way betweenness is run at web scale; exact all-pairs is O(V·E) and
off the table at 10^12 pages).

Contract (fixed, deterministic — the single-node oracle, the networkx
parity tests, and the DuckDB chained-CTE gate oracle replay it exactly):

  directed simple graph (dups/self-loops dropped); source set S
  forward, per source s ∈ S (all sources BATCHED through the same
  level-synchronous supersteps, state keyed (s, vertex)):
    dist_s / sigma_s by BFS level: sigma_s[v] = Σ sigma_s[u] over
    shortest-path predecessors u (first-reaching level, hop metric)
  backward, by descending level t:
    delta_s[u] = Σ_{u→w, dist_s[w]=dist_s[u]+1}
                 sigma_s[u]/sigma_s[w] · (1 + delta_s[w])
  bc[v] = Σ_{s ∈ S, s ≠ v} delta_s[v]      (raw Brandes partial sums —
  no normalization, no n/k extrapolation; callers scale as they wish)

Scale shape (SURVEY.md §4.3): the edge table is laid down ONCE,
hash-partitioned + sorted by ``src`` (the O7 shuffle-once layout); every
forward and backward level joins that static cache against a
(source × frontier)-row state side — |S| sources ride each superstep
together, so the superstep count is the graph diameter, not |S|·diameter.
Per-level shuffles are state-sized (partial+final aggs), never edge-sized;
per-level DataFrames are localCheckpointed (flat lineage) and retained for
the backward sweep. Driver-side actions are one count per forward level
(loop termination) — no data collects.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class BetweennessResult:
    # (vertex:long, betweenness:double) — every graph vertex, 0.0 fill
    scores: DataFrame
    num_levels: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def betweenness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame | None = None,
    *,
    max_levels: int = 100,
) -> BetweennessResult:
    """Brandes betweenness over the DIRECTED edge table ``(src, dst)``,
    sourced from ``sources`` (a (vertex) DataFrame; default = every vertex
    ⇒ exact betweenness). Returns raw partial-dependency sums per the
    module-docstring contract."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    e.count()
    verts = _truncate(
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    if sources is None:
        sources = verts
    # level 0: each source settles itself with one path of length 0
    level = _truncate(
        sources.select(F.col("vertex").cast("long").alias("s"))
        .distinct()
        .select(
            "s",
            F.col("s").alias("vertex"),
            F.lit(1.0).alias("sigma"),
        )
    )
    levels: list[DataFrame] = [level]
    settled = level.select("s", "vertex")
    metrics: list[dict] = []
    converged = False
    for lvl in range(1, max_levels + 1):
        # path counts flow along the frontier's out-edges; a vertex first
        # reached at this level has sigma = the sum over ALL its level-(t-1)
        # shortest-path predecessors (Brandes' forward recurrence)
        cand = (
            e.join(levels[-1].withColumnRenamed("vertex", "src"), "src")
            .groupBy("s", F.col("dst").alias("vertex"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = _truncate(
            cand.join(settled, ["s", "vertex"], "left_anti")
        )
        n_new = new.count()
        metrics.append({"level": lvl, "settled_pairs": n_new})
        if n_new == 0:
            converged = True
            break
        levels.append(new)
        settled = _truncate(settled.unionByName(new.select("s", "vertex")))
    num_levels = len(levels) - 1

    # backward dependency accumulation: deepest level has no shortest-path
    # successors ⇒ delta 0; walking up, each level joins the static edge
    # cache once against the (already delta-annotated) level below
    below = levels[-1].withColumn("delta", F.lit(0.0))
    deltas: list[DataFrame] = [below]
    for t in range(num_levels - 1, -1, -1):
        contrib = (
            e.join(levels[t].withColumnRenamed("vertex", "src"), "src")
            .join(
                below.select(
                    "s",
                    F.col("vertex").alias("dst"),
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["s", "dst"],
            )
            .groupBy("s", F.col("src").alias("vertex"))
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("d")
            )
        )
        below = _truncate(
            levels[t]
            .join(contrib, ["s", "vertex"], "left")
            .select(
                "s",
                "vertex",
                "sigma",
                F.coalesce("d", F.lit(0.0)).alias("delta"),
            )
        )
        deltas.append(below)
    all_deltas = reduce(DataFrame.unionByName, deltas)
    scores = (
        all_deltas.where(F.col("vertex") != F.col("s"))
        .groupBy("vertex")
        .agg(F.sum("delta").alias("bc"))
    )
    out = verts.join(scores, "vertex", "left").select(
        "vertex", F.coalesce("bc", F.lit(0.0)).alias("betweenness")
    )
    e.unpersist()
    return BetweennessResult(out, num_levels, converged, metrics)


def betweenness_single_node(
    pairs: list[tuple[int, int]],
    *,
    sources: list[int] | None = None,
) -> dict[int, float]:
    """Single-node Brandes reference — the pytest parity oracle (same
    contract as the module docstring; textbook Brandes 2001 with a BFS
    queue, pure Python)."""
    succ: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for u, v in set(pairs):
        if u == v:
            continue
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, []).append(v)
    bc = {v: 0.0 for v in nodes}
    srcs = sorted(nodes) if sources is None else sorted(set(sources))
    for s in srcs:
        dist = {s: 0}
        sigma = {s: 1.0}
        order: list[int] = [s]
        queue = [s]
        while queue:
            nxt: list[int] = []
            for u in queue:
                for w in succ.get(u, ()):
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        sigma[w] = 0.0
                        nxt.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            order.extend(nxt)
            queue = nxt
        delta = {v: 0.0 for v in dist}
        for u in reversed(order):
            for w in succ.get(u, ()):
                if dist.get(w) == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if u != s:
                bc[u] += delta[u]
    return bc
