"""k-core: the maximal subgraph in which every vertex has degree ≥ k.

Web-graph companion to the component statistics family (SURVEY.md §2 R7–R10
"dust"): where ``dust`` drops SMALL components, the k-core drops WEAKLY
CONNECTED vertices — the standard link-graph filter for separating a densely
linked core from tendrils before ranking or community detection.

Distributed shape (iterative peeling, the textbook parallel algorithm):

  e_0 = canonical undirected simple edges
  round i: deg_i = degree over e_{i-1};  keep_i = {v : deg_i(v) ≥ k}
           e_i = e_{i-1} semi-joined to keep_i on BOTH endpoints
  fixpoint when no vertex is dropped.

Each round is one vertex-sized hash aggregation plus two semi-joins on the
(monotonically shrinking) edge table — no windows, no collects beyond the
per-round convergence scalar. The edge table is re-persisted per round and
the previous round unpersisted, so peak storage is two generations of a
shrinking table. At web scale most mass is peeled in the first 2-3 rounds
(degree distributions are heavy-tailed), after which rounds are cheap; the
round count is bounded by the degeneracy ordering depth, small in practice.

The converged k-core is UNIQUE (standard result), so the driver gate can
hash-compare the converged Spark output against a chained-CTE DuckDB replay
with a fixed round budget ≥ the fixpoint depth (extra rounds are no-ops).

Output: one row per k-core vertex with its degree INSIDE the core —
``(vertex:long, kcore_deg:long)``; empty (same schema) when the core is.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected


@dataclass
class KCoreResult:
    core: DataFrame  # (vertex:long, kcore_deg:long)
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 200,
    broadcast_drop_rows: int = 4_000_000,
) -> KCoreResult:
    """Peel ``edges`` (treated as undirected, self-loops/dups dropped) down
    to the k-core. ``k >= 2``; for k ≤ 1 the k-core is the whole simple
    graph minus isolated vertices, which the same loop returns in 0 rounds.

    Per-round edge filter: an edge survives iff NEITHER endpoint was
    dropped, so when the round's dropped set fits a broadcast
    (``broadcast_drop_rows``) the filter is two broadcast ANTI-joins —
    map-only, preserving the edge table's partitioning, no shuffle.
    Heavy-tailed graphs drop most mass in round 0 and a trickle after, so
    all but (at most) the first round take the broadcast path; oversized
    rounds fall back to shuffle semi-joins against the keep set.
    """
    if k < 0:
        raise ValueError("k_core: k must be non-negative")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        canonical_undirected(edges)
        .repartition(p, "src")
        .persist()
    )
    e.count()  # materialize the persisted canonical edge table once
    metrics: list[dict] = []
    converged = False
    rounds = 0
    prev: DataFrame | None = None
    for rounds in range(max_rounds + 1):
        deg = (
            e.select(F.col("src").alias("vertex"))
            .unionAll(e.select(F.col("dst").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count("*").alias("deg"))
        )
        # ONE degree job per round: checkpoint the (small) dropped set and
        # read the convergence scalar off the checkpoint — the deg shuffle
        # is not recomputed for the scalar, and running it materializes the
        # lazily-persisted current edge generation, after which the
        # grandparent generation is safe to release.
        drop = _truncate(deg.where(F.col("deg") < k).select("vertex"))
        n_dropped = drop.count()
        metrics.append({"round": rounds, "dropped": n_dropped})
        if prev is not None:
            prev.unpersist()
            prev = None
        if n_dropped == 0:
            converged = True
            break
        if n_dropped <= broadcast_drop_rows:
            nxt = (
                e.join(
                    F.broadcast(drop.withColumnRenamed("vertex", "src")),
                    "src",
                    "left_anti",
                )
                .join(
                    F.broadcast(drop.withColumnRenamed("vertex", "dst")),
                    "dst",
                    "left_anti",
                )
                .select("src", "dst")
                .persist()
            )
        else:
            keep = _truncate(deg.where(F.col("deg") >= k).select("vertex"))
            nxt = (
                e.join(
                    keep.withColumnRenamed("vertex", "src"), "src", "left_semi"
                )
                .join(
                    keep.withColumnRenamed("vertex", "dst"), "dst", "left_semi"
                )
                .select("src", "dst")
                .repartition(p, "src")
                .persist()
            )
        prev, e = e, nxt
    core = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("kcore_deg"))
    )
    # truncate before unpersisting the last edge generation: the core is
    # vertex-sized, while its raw lineage chains through every peel round
    out = _truncate(
        core.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col("kcore_deg").cast("long").alias("kcore_deg"),
        )
    )
    e.unpersist()
    return KCoreResult(out, rounds, converged, metrics)


@dataclass
class CoreDecompositionResult:
    cores: DataFrame  # (vertex:long, core:long)
    max_core: int
    num_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 1000,
) -> CoreDecompositionResult:
    """Full core decomposition: the core NUMBER of every vertex (the largest
    k such that v lies in the k-core), all k in ONE pass over a shrinking
    edge table — the standard user ask that ``k_core`` (one k per call)
    doesn't answer.

    Algorithm (distributed peeling by ascending k, public textbook shape):
    for k = 2, 3, ...: peel the current remainder to the k-core; every
    vertex dropped on the way has core number k-1. Terminates when the
    remainder is empty (k reaches degeneracy + 2). Each peel round is the
    same vertex-sized degree aggregation + two semi-joins as ``k_core``;
    TOTAL work is one k_core run per distinct core level, but each level
    starts from the previous level's (smaller) remainder rather than from
    scratch — at web scale the k=2 level removes the long tail and the
    higher levels run on a fast-shrinking dense core. Like ``k_core``, a
    round whose dropped set fits a broadcast filters the edge table with
    two map-only anti-joins instead of shuffle semi-joins.

    Output: ``(vertex:long, core:long)``, one row per vertex of the simple
    graph (every edge endpoint; isolated vertices can't appear in an edge
    table). Driver-gate oracle: per-k chained-CTE peel replays, core =
    1 + Σ_k [v ∈ k-core] (`core_numbers_ring`). pytest: networkx
    ``core_number`` parity.
    """
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # localCheckpoint (not persist): the edge table is re-derived every
    # round across MANY rounds (Σ_k peel depth), so lineage must be cut at
    # the source each generation or the logical plan grows with the round
    # count (measured: plan-string OOM near round ~25 on an 8g driver)
    e = _truncate(canonical_undirected(edges).repartition(p, "src"))
    from .edges import vertices as _vertices

    # explicit active-vertex set: a vertex whose neighbors ALL drop in one
    # round disappears from the next degree table (degree 0 has no edge
    # rows) — the anti-join against `keep` is what still catches it
    active_v = _truncate(_vertices(e))
    n_active = active_v.count()
    assigned: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    k = 2
    while n_active > 0:
        # peel the remainder at threshold k to fixpoint
        while True:
            if rounds >= max_rounds:
                raise RuntimeError(
                    f"core_numbers: max_rounds={max_rounds} exhausted at"
                    f" k={k} — raise max_rounds"
                )
            deg = (
                e.select(F.col("src").alias("vertex"))
                .unionAll(e.select(F.col("dst").alias("vertex")))
                .groupBy("vertex")
                .agg(F.count("*").alias("deg"))
            )
            keep = _truncate(deg.where(F.col("deg") >= k).select("vertex"))
            dropped = _truncate(active_v.join(keep, "vertex", "left_anti"))
            n_drop = dropped.count()
            rounds += 1
            metrics.append({"k": k, "round": rounds, "dropped": n_drop})
            if n_drop == 0:
                break
            assigned.append(
                dropped.select("vertex", F.lit(k - 1).cast("long").alias("core"))
            )
            active_v = keep
            n_active -= n_drop
            if n_active == 0:
                break
            if n_drop <= 4_000_000:
                # dropped set fits a broadcast → filter edges with two
                # map-only anti-joins (same trick as k_core): no shuffle,
                # partitioning preserved
                e = _truncate(
                    e.join(
                        F.broadcast(
                            dropped.withColumnRenamed("vertex", "src")
                        ),
                        "src",
                        "left_anti",
                    )
                    .join(
                        F.broadcast(
                            dropped.withColumnRenamed("vertex", "dst")
                        ),
                        "dst",
                        "left_anti",
                    )
                    .select("src", "dst")
                )
            else:
                e = _truncate(
                    e.join(
                        keep.withColumnRenamed("vertex", "src"),
                        "src",
                        "left_semi",
                    )
                    .join(
                        keep.withColumnRenamed("vertex", "dst"),
                        "dst",
                        "left_semi",
                    )
                    .select("src", "dst")
                    .repartition(p, "src")
                )
        if n_active == 0:
            break
        k += 1
    converged = True
    if not assigned:
        empty = (
            spark.range(0)
            .select(
                F.col("id").alias("vertex"), F.col("id").alias("core")
            )
        )
        return CoreDecompositionResult(empty, 0, rounds, converged, metrics)
    out = assigned[0]
    for part in assigned[1:]:
        out = out.unionAll(part)
    out = _truncate(
        out.select(F.col("vertex").cast("long").alias("vertex"), "core")
    )
    max_core = out.agg(F.max("core").alias("m")).collect()[0]["m"] or 0
    return CoreDecompositionResult(out, int(max_core), rounds, converged, metrics)


def k_core_single_node(
    pairs: list[tuple[int, int]], k: int
) -> dict[int, int]:
    """Single-node peeling reference for the pytest gate (same semantics;
    public textbook algorithm). Returns {vertex: degree inside the core}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        drop = [v for v, nb in adj.items() if len(nb) < k]
        changed = bool(drop)
        for v in drop:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    return {v: len(nb) for v, nb in adj.items() if nb}
