"""Bowtie decomposition of a directed web graph (Broder et al. 2000,
"Graph structure in the Web") — the canonical macro-structure analysis:

    CORE          the largest SCC (ties broken by min component id)
    IN            reaches CORE, not in it
    OUT           reachable from CORE, not in it
    TUBE          reachable from IN and reaching OUT, bypassing CORE
    TENDRIL       weakly connected to CORE but none of the above
                  (hangs off IN, or dangles into OUT)
    DISCONNECTED  everything else

Built entirely from primitives this engine already gates: SCC
(operators/scc.py) for the core, frontier BFS fixpoints for the four
reachability sets, and the CC kernel's weak-component semantics via a
symmetrized frontier sweep. Every per-step shuffle is frontier-sized over a
once-persisted edge table; the frontier shrinks monotonically (visited
vertices are anti-joined out), so the cost envelope matches one CC
superstep per BFS level — the published Pregel-family shape.

IN ∩ OUT = ∅ by construction: a vertex both reaching and reachable from
CORE would be mutually reachable with it, i.e. inside it.

Output regions are UPPERCASE strings; (vertex:long, region:string) is
deterministic and hash-comparable against a recursive-CTE DuckDB oracle
(driver gate row ``bowtie_parts``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices
from .scc import strongly_connected_components


@dataclass
class BowtieResult:
    regions: DataFrame  # (vertex:long, region:string)
    core_component: int  # min-id label of the largest SCC
    region_counts: dict[str, int]
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _reachable_from(seeds: DataFrame, e: DataFrame) -> DataFrame:
    """All vertices reachable from ``seeds`` along ``e`` (seeds included).
    Frontier BFS: per level one edge join + one anti-join; the frontier
    carries only NEWLY reached vertices, so work decays with expansion."""
    reached = _truncate(seeds.select("vertex").distinct())
    frontier = reached
    while True:
        nxt = (
            e.join(frontier.withColumnRenamed("vertex", "src"), "src")
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(reached, "vertex", "left_anti")
        )
        frontier = _truncate(nxt)
        if frontier.isEmpty():
            return reached
        reached = _truncate(reached.unionAll(frontier))


def bowtie(spark: SparkSession, edges: DataFrame) -> BowtieResult:
    """Classify every vertex of the DIRECTED simple graph (duplicates and
    self-loops dropped, self-loop-only vertices retained) into the six
    bowtie regions."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e_cast = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    e = (
        e_cast.where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .persist()
    )
    et = (
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(p, "src")
        .persist()
    )
    esym = _truncate(e.unionAll(et))
    verts = _truncate(vertices(e_cast))

    scc = strongly_connected_components(spark, e_cast)
    comps = _truncate(scc.components)
    top = (
        comps.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not top:  # empty graph
        empty = spark.createDataFrame([], "vertex long, region string")
        return BowtieResult(empty, -1, {})
    core_id = int(top[0]["component"])
    core = _truncate(
        comps.where(F.col("component") == core_id).select("vertex")
    )

    r_out = _reachable_from(core, e)  # core + OUT
    r_in = _reachable_from(core, et)  # core + IN
    in_set = _truncate(r_in.join(core, "vertex", "left_anti"))
    out_set = _truncate(r_out.join(core, "vertex", "left_anti"))
    settled = _truncate(core.unionAll(in_set).unionAll(out_set))

    # tubes: IN → ... → OUT paths that bypass the core. Restrict both
    # sweeps to unsettled vertices by anti-joining as we classify instead
    # of filtering the edge table (the sweeps stay tiny: frontier-sized).
    fwd_from_in = _reachable_from(in_set, e)
    bwd_from_out = _reachable_from(out_set, et)
    tube = _truncate(
        fwd_from_in.join(bwd_from_out.select("vertex"), "vertex")
        .join(settled, "vertex", "left_anti")
    )

    # weak component of the core: symmetrized sweep from the core
    weak = _reachable_from(core, esym)

    classified = (
        verts.join(core.withColumn("r1", F.lit("CORE")), "vertex", "left")
        .join(in_set.withColumn("r2", F.lit("IN")), "vertex", "left")
        .join(out_set.withColumn("r3", F.lit("OUT")), "vertex", "left")
        .join(tube.withColumn("r4", F.lit("TUBE")), "vertex", "left")
        .join(weak.withColumn("r5", F.lit("TENDRIL")), "vertex", "left")
        .select(
            "vertex",
            F.coalesce("r1", "r2", "r3", "r4", "r5", F.lit("DISCONNECTED"))
            .alias("region"),
        )
    )
    regions = _truncate(
        classified.select(
            F.col("vertex").cast("long").alias("vertex"), "region"
        )
    )
    counts = {
        r["region"]: r["n"]
        for r in regions.groupBy("region").agg(F.count("*").alias("n"))
        .collect()
    }
    e.unpersist()
    et.unpersist()
    return BowtieResult(regions, core_id, counts)
