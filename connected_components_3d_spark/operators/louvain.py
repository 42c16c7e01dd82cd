"""Parallel Louvain community detection — modularity-greedy label moving
plus graph contraction, the standard community ask beyond plain LPA
(operators/lpa.py): LPA finds propagation plateaus, Louvain maximizes
modularity, the metric operators/modularity.py already scores.

Algorithm (synchronous parallel local-moving, Staudt–Meyerhenke style,
made DETERMINISTIC so a DuckDB oracle can replay it bit-for-bit):

  per level:
    1. k_i = weighted degree (self-loops count twice), m = total weight.
    2. sweep r (r = 0,1,...): only vertices with vertex % 2 == r % 2 are
       ACTIVE (parity alternation — the standard guard against the
       synchronous two-coloring oscillation; deterministic, unlike the
       usual randomized sweeps, so every sweep is replayable).
    3. for each active i: candidate communities = {comm(j) : j ~ i} ∪
       {comm(i)}; k_{i,c} = weight from i into c (self-loops excluded —
       they move with i and cancel out of every comparison).
    4. EXACT INTEGER gains: with integral weights, the Louvain gain
       scaled by 2m is the integer
           gain2m(i→c) = 2m·k_{i,c} − k_i·(Σtot(c) − [c = comm(i)]·k_i)
       computed in decimal(38,0) / HUGEINT — Spark and DuckDB agree
       exactly, no float-sum drift, so argmax decisions replay. Ties
       break on the SMALLEST community id; i moves iff its best move
       gain strictly beats the stay gain.
    5. sweeps stop early when nothing moved (scalar count action).
  contraction: vertices = communities; inter-community weights sum;
  intra-community weight becomes a self-loop. Levels stop when no move
  happened or the graph stopped shrinking. Final labels compose through
  the level maps and are canonicalized to the MIN original member vertex.

Scale shape: each sweep is two vertex-sized joins (comm lookup, tot
lookup), one edge-sized groupBy (k_{i,c}), one community-sized groupBy
(Σtot), and a per-vertex argmax window over the candidate table (≤ deg(i)
rows per vertex) — all key-partitioned shuffles, no windows over global
orderings, no driver-side data collects (move counts only). Contraction
is one groupBy over the edge table. Hub skew in k_{i,c} is bounded by
vertex degree, the same envelope as PageRank's contribution shuffle.

Weights must be integral (weight_col cast to long; rows with NULL weight
rejected) — that integrality is what buys the exact-integer gain
comparison above. Floats would make tie-breaks engine-dependent.

Gate: `louvain_cliques` runs ONE level × TWO sweeps on the ring-of-cliques
nation fixture and hash-compares (vertex, community) against a chained-CTE
DuckDB replay of the same two sweeps (same parity rule, same HUGEINT
gains, same tie-breaks, same min-member relabel). The full multi-level
operator is pytest-gated: single-node replay parity, ring-of-cliques
recovery, modularity monotonicity per sweep, weighted semantics,
degenerates.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class LouvainResult:
    communities: DataFrame  # (vertex:long, community:long) — min-member label
    modularity: float
    num_levels: int
    num_sweeps: int  # total sweeps across levels
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _prep_edges(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """Canonical weighted simple graph: (u ≤ v, w:long) with parallel rows
    summed; self-loops kept (they carry contracted intra weight)."""
    s = F.col("src").cast("long")
    d = F.col("dst").cast("long")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        edges.select(
            F.least(s, d).alias("u"), F.greatest(s, d).alias("v"), w.alias("w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )


def _level_tables(e: DataFrame):
    """sym (i, j, w) without self-loops, self (i, sw), deg (i, k)."""
    nonself = e.where(F.col("u") != F.col("v"))
    sym = nonself.select(
        F.col("u").alias("i"), F.col("v").alias("j"), "w"
    ).unionByName(nonself.select(F.col("v").alias("i"), F.col("u").alias("j"), "w"))
    self_w = e.where(F.col("u") == F.col("v")).select(
        F.col("u").alias("i"), F.col("w").alias("sw")
    )
    deg = (
        sym.groupBy("i")
        .agg(F.sum("w").alias("kn"))
        .join(self_w, "i", "full")
        .select(
            "i",
            (
                F.coalesce("kn", F.lit(0)) + 2 * F.coalesce("sw", F.lit(0))
            ).alias("k"),
        )
    )
    return sym, self_w, deg


def _sweep(
    cm: DataFrame,
    sym: DataFrame,
    deg: DataFrame,
    two_m: int,
    parity: int,
    p: int,
) -> DataFrame:
    """One deterministic parallel move sweep; returns the new (vertex, comm)
    table with a `moved` flag column."""
    dec = "decimal(38,0)"
    cj = cm.select(F.col("vertex").alias("j"), F.col("comm").alias("cj"))
    # weight from i into each neighbour community
    kic = (
        sym.join(cj, "j")
        .groupBy(F.col("i"), F.col("cj").alias("c"))
        .agg(F.sum("w").alias("kic"))
    )
    tot = (
        cm.join(deg.withColumnRenamed("i", "vertex"), "vertex")
        .groupBy(F.col("comm").alias("c"))
        .agg(F.sum("k").alias("tot"))
    )
    own = cm.select(F.col("vertex").alias("i"), F.col("comm").alias("own"))
    stay = own.select("i", F.col("own").alias("c"), F.lit(0).cast("long").alias("kic"))
    cand = (
        kic.unionByName(stay)
        .groupBy("i", "c")
        .agg(F.sum("kic").alias("kic"))
        .join(own, "i")
        .join(tot, "c")
        .join(deg, "i")
    )
    gain = cand.select(
        "i",
        "c",
        "own",
        (
            F.lit(two_m).cast(dec) * F.col("kic").cast(dec)
            - F.col("k").cast(dec)
            * (
                F.col("tot")
                - F.when(F.col("c") == F.col("own"), F.col("k")).otherwise(F.lit(0))
            ).cast(dec)
        ).alias("g"),
    )
    stay_g = gain.where(F.col("c") == F.col("own")).select(
        "i", F.col("g").alias("sg")
    )
    wnd = Window.partitionBy("i").orderBy(F.col("g").desc(), F.col("c").asc())
    best = (
        gain.where(F.col("c") != F.col("own"))
        .withColumn("rn", F.row_number().over(wnd))
        .where(F.col("rn") == 1)
        .select("i", F.col("c").alias("bc"), F.col("g").alias("bg"))
    )
    nxt = (
        cm.join(best.withColumnRenamed("i", "vertex"), "vertex", "left")
        .join(stay_g.withColumnRenamed("i", "vertex"), "vertex", "left")
        .select(
            "vertex",
            F.when(
                (F.col("vertex") % 2 == parity)
                & F.col("bg").isNotNull()
                & (F.col("bg") > F.coalesce(F.col("sg"), F.lit(0).cast("decimal(38,0)")))
            , F.col("bc"))
            .otherwise(F.col("comm"))
            .alias("comm"),
            (
                (F.col("vertex") % 2 == parity)
                & F.col("bg").isNotNull()
                & (F.col("bg") > F.coalesce(F.col("sg"), F.lit(0).cast("decimal(38,0)")))
                & (F.col("bc") != F.col("comm"))
            ).alias("moved"),
        )
        .repartition(p, "vertex")
    )
    return nxt


def refine_communities(
    spark: SparkSession,
    edges: DataFrame,
    communities: DataFrame,
    *,
    method: str = "hashmin",
) -> DataFrame:
    """Leiden-style connectivity refinement: split every internally
    disconnected community into its connected parts.

    Louvain's known defect (the one Leiden's refinement phase exists to
    fix) is that label moving can strand a community's members with no
    internal path — e.g. the vertex whose id NAMES the community moves
    away, leaving the stayers in two islands that only touched through
    it. Guarantee restored here: a community is valid iff its induced
    subgraph is connected, so re-run CC on the INTRA-community edge set
    (edge kept iff both endpoints share a label — one vertex-sized join
    per side) and relabel each part to its min member. Vertices in
    ``communities`` with no intra edge (isolated members) become their
    own singletons via the left join + coalesce.

    Scale shape: two hash joins (edges ⋈ labels×2) + one CC run over a
    SUBSET of the input edges — strictly cheaper than the Louvain level
    that produced the labels; the CC kernel is the scaled frontier
    hash-min/blockuf machinery (operators/cc.py), not a new path.

    Input ``communities``: (vertex, community); any community id space.
    Output: (vertex, community) with community = min member vertex id of
    the CONNECTED part. Deterministic, SQL-replayable (min-label closure
    within communities — the `louvain_refined_cliques` gate row replays
    the sweeps AND this refinement in one chained CTE)."""
    from .cc import connected_components

    cu = communities.select(
        F.col("vertex").alias("u"), F.col("community").alias("cu")
    )
    cv = communities.select(
        F.col("vertex").alias("v"), F.col("community").alias("cv")
    )
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"),
            F.col("dst").cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .join(cu, "u")
        .join(cv, "v")
        .where(F.col("cu") == F.col("cv"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    parts = connected_components(spark, e, method=method).components
    return (
        communities.join(
            parts.withColumnRenamed("component", "part"), "vertex", "left"
        )
        .select(
            "vertex",
            F.coalesce(F.col("part"), F.col("vertex")).alias("community"),
        )
    )


def louvain_sweeps(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str | None = None,
    sweeps: int = 2,
) -> DataFrame:
    """Fixed-round, single-level local-moving replay — the gate surface.

    Runs EXACTLY ``sweeps`` parity-alternating move sweeps of the level-0
    local-moving phase (no early stop, no contraction) and returns the
    min-member-canonical (vertex, community) labels. Every decision is an
    exact-integer argmax (module docstring), so a chained-CTE DuckDB
    oracle (`driver_queries._louvain_sweeps_sql`) replays the whole
    process bit-for-bit; the driver gate hash-compares the two."""
    if sweeps < 1:
        raise ValueError("sweeps must be >= 1")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e0 = _truncate(_prep_edges(edges, weight_col).repartition(p, "u").persist())
    two_m = 2 * (e0.agg(F.sum("w")).collect()[0][0] or 0)
    if two_m == 0:
        return spark.createDataFrame([], "vertex long, community long")
    sym, _, deg = _level_tables(e0)
    sym = _truncate(sym.repartition(p, "i").persist())
    deg = _truncate(deg.repartition(p, "i").persist())
    cm = _truncate(
        deg.select(F.col("i").alias("vertex"), F.col("i").alias("comm"))
        .repartition(p, "vertex")
        .persist()
    )
    for s in range(sweeps):
        cm = _truncate(
            _sweep(cm, sym, deg, two_m, s % 2, p).select("vertex", "comm").persist()
        )
    rep = cm.groupBy("comm").agg(F.min("vertex").alias("community"))
    return cm.join(rep, "comm").select("vertex", "community")


def louvain(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str | None = None,
    sweeps_per_level: int = 4,
    max_levels: int = 3,
) -> LouvainResult:
    """Deterministic parallel Louvain over the undirected weighted simple
    graph induced by ``edges`` (src/dst[, weight_col], any orientation;
    integral weights). Returns min-original-member community labels."""
    if sweeps_per_level < 1 or max_levels < 1:
        raise ValueError("sweeps_per_level and max_levels must be >= 1")
    metrics: list[dict] = []
    t0 = time.time()
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e0 = _truncate(_prep_edges(edges, weight_col).repartition(p, "u").persist())
    if e0.where(F.col("w").isNull()).count() > 0:
        raise ValueError("louvain requires integral non-NULL weights")
    m_rows = e0.count()
    if m_rows == 0:
        empty = spark.createDataFrame([], "vertex long, community long")
        return LouvainResult(empty, 0.0, 0, 0, metrics)
    two_m = 2 * e0.agg(F.sum("w")).collect()[0][0]

    # mapping from ORIGINAL vertices to current-level vertices
    verts0 = (
        e0.select(F.col("u").alias("vertex"))
        .unionByName(e0.select(F.col("v").alias("vertex")))
        .distinct()
    )
    mapping = verts0.select("vertex", F.col("vertex").alias("node")).persist()

    e = e0
    total_sweeps = 0
    levels = 0
    for level in range(max_levels):
        sym, self_w, deg = _level_tables(e)
        sym = _truncate(sym.repartition(p, "i").persist())
        deg = _truncate(deg.repartition(p, "i").persist())
        cm = deg.select(F.col("i").alias("vertex"), F.col("i").alias("comm"))
        cm = _truncate(cm.repartition(p, "vertex").persist())
        cm.count()
        level_moves = 0
        for s in range(sweeps_per_level):
            nxt = _sweep(cm, sym, deg, two_m, s % 2, p)
            nxt = _truncate(nxt.persist())
            moved = nxt.where("moved").count()
            cm = nxt.select("vertex", "comm")
            total_sweeps += 1
            level_moves += moved
            metrics.append(
                {
                    "level": level,
                    "sweep": s,
                    "moved": int(moved),
                    "sec": time.time() - t0,
                }
            )
            if moved == 0:
                break
        levels += 1
        if level_moves == 0:
            break
        # compose mapping: original vertex → community at this level
        mapping = (
            mapping.join(
                cm.withColumnRenamed("vertex", "node").withColumnRenamed(
                    "comm", "nxt"
                ),
                "node",
            )
            .select("vertex", F.col("nxt").alias("node"))
        )
        mapping = _truncate(mapping.repartition(p, "vertex").persist())
        mapping.count()
        if level == max_levels - 1:
            break
        # contract: communities become vertices, weights aggregate
        cu = cm.select(F.col("vertex").alias("u"), F.col("comm").alias("cu"))
        cv = cm.select(F.col("vertex").alias("v"), F.col("comm").alias("cv"))
        e_new = (
            e.join(cu, "u")
            .join(cv, "v")
            .select(
                F.least("cu", "cv").alias("u"),
                F.greatest("cu", "cv").alias("v"),
                "w",
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
        e_new = _truncate(e_new.repartition(p, "u").persist())
        n_before = cm.count()
        n_after = cm.select("comm").distinct().count()
        if n_after >= n_before:
            break
        e = e_new

    # canonical min-original-member relabel
    rep = mapping.groupBy(F.col("node")).agg(F.min("vertex").alias("community"))
    communities = (
        mapping.join(rep, "node").select("vertex", "community").persist()
    )

    # final modularity (reporting only, double)
    cmap_u = communities.select(
        F.col("vertex").alias("u"), F.col("community").alias("cu")
    )
    cmap_v = communities.select(
        F.col("vertex").alias("v"), F.col("community").alias("cv")
    )
    lab = e0.join(cmap_u, "u").join(cmap_v, "v")
    m_w = two_m / 2.0
    internal = (
        lab.where(F.col("cu") == F.col("cv")).agg(F.sum("w")).collect()[0][0] or 0
    )
    _, _, deg0 = _level_tables(e0)
    tot0 = (
        communities.join(deg0.withColumnRenamed("i", "vertex"), "vertex")
        .groupBy("community")
        .agg(F.sum("k").alias("tot"))
        .select(F.sum(F.col("tot").cast("double") * F.col("tot")).alias("s"))
        .collect()[0][0]
        or 0.0
    )
    modularity = internal / m_w - tot0 / (two_m * two_m) if m_w else 0.0
    metrics.append({"phase": "done", "sec": time.time() - t0})
    return LouvainResult(communities, float(modularity), levels, total_sweeps, metrics)
