"""Topological levels of a DAG: distributed Kahn peeling.

Link-graph companion to the SCC condensation (operators/condense.py): the
condensation of any directed graph is a DAG, and the question users ask of
it — "how deep is the link hierarchy, and at which tier does each component
sit?" — is exactly the longest-path layering this operator computes. It is
also the standard scheduling primitive (dependency tiers, crawl-frontier
generations) over any acyclic edge table.

Semantics: ``level(v)`` = length of the LONGEST path ending at ``v``
(roots — zero in-degree vertices — are level 0). Equivalently the removal
round of parallel Kahn peeling, since a vertex is removable exactly when
every predecessor has been removed, i.e. one round after its deepest
predecessor. Levels are UNIQUE for a DAG, so the driver gate can
hash-compare the converged Spark output against a fixed-round chained-CTE
DuckDB replay of the same peel (round budget ≥ depth; extra rounds no-op).

Distributed shape (one peel round per DAG level):

  round i: sinks_of_in = DISTINCT dst over remaining edges   (vertex-sized)
           zero_i     = remaining vertices ANTI JOIN sinks_of_in
           level(zero_i) = i
           edges      = edges ANTI JOIN zero_i ON src        (shrinking)
           vertices   = vertices ANTI JOIN zero_i

Each round is a vertex-sized distinct plus two anti semi-joins on
monotonically shrinking tables — no windows, no driver-side data collects
(the per-round scalar count doubles as materialization). Every round's
outputs are ``localCheckpoint(eager=True)``-truncated, the same lineage
discipline as the k-core peel (operators/kcore.py): without it a deep peel
(depth ~ rounds) nests the Catalyst plan one generation per round and blows
the driver heap long before the data does. Round count = DAG depth + 1; for
web-graph condensations the depth is small (bow-tie chains, not paths), and
each late round touches only the surviving deep tail. On a real cluster the
same truncation point is where a reliable ``checkpoint()`` to the
checkpoint dir would slot in for executor-loss tolerance.
Cycles are detected exactly: when no vertex has
zero in-degree but vertices remain, the remainder is the cyclic core —
``on_cycle="raise"`` (default) refuses to return a partial map,
``on_cycle="partial"`` returns the acyclic prefix with ``converged=False``.

Output: ``(vertex:long, level:long)``, one row per vertex reachable in the
acyclic peel (every vertex, for a DAG).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TopoResult:
    levels: DataFrame  # (vertex:long, level:long)
    num_rounds: int  # peel rounds executed = depth + 1 on a DAG
    converged: bool  # False only with on_cycle="partial" and a cycle
    metrics: list[dict] = field(default_factory=list)


def topo_levels(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 100_000,
    on_cycle: str = "raise",
) -> TopoResult:
    """Longest-path levels of the DAG ``edges`` (src, dst); parallel edges
    collapse, self-loops are cycles. ``on_cycle``: "raise" (default) or
    "partial" (acyclic prefix + ``converged=False``)."""
    if on_cycle not in ("raise", "partial"):
        raise ValueError("topo_levels: on_cycle must be 'raise' or 'partial'")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
        .repartition(p, "src")
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    remaining_v = verts
    remaining_e = e
    level_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    cyclic_rest = 0
    for rnd in range(max_rounds + 1):
        has_in = remaining_e.select(F.col("dst").alias("vertex")).distinct()
        # eager localCheckpoint: materializes (convergence scalar is then a
        # count over checkpointed blocks) AND truncates lineage — a deep
        # peel otherwise nests one plan generation per round (driver OOM)
        zero = remaining_v.join(has_in, "vertex", "left_anti").localCheckpoint(
            eager=True
        )
        peeled = zero.count()
        if peeled == 0:
            cyclic_rest = remaining_v.count()
            break
        rounds = rnd + 1
        level_parts.append(
            zero.select("vertex", F.lit(rnd).cast("long").alias("level"))
        )
        remaining_e = (
            remaining_e.join(
                zero.select(F.col("vertex").alias("src")), "src", "left_anti"
            )
            .repartition(p, "src")
            .localCheckpoint(eager=True)
        )
        remaining_v = remaining_v.join(
            zero, "vertex", "left_anti"
        ).localCheckpoint(eager=True)
        kept_edges = remaining_e.count()
        metrics.append({"round": rnd, "peeled": peeled, "edges": kept_edges})
    else:
        raise RuntimeError(
            f"topo_levels: max_rounds={max_rounds} exhausted before the peel "
            "converged — raise max_rounds (levels are never returned partial "
            "on round exhaustion)"
        )
    if cyclic_rest > 0 and on_cycle == "raise":
        raise ValueError(
            f"topo_levels: input is not a DAG — {cyclic_rest} vertices form "
            "a cyclic core with no zero-in-degree vertex (run SCC "
            "condensation first, or pass on_cycle='partial')"
        )
    if level_parts:
        out = level_parts[0]
        for part in level_parts[1:]:
            out = out.unionAll(part)
    else:
        out = verts.select(
            "vertex", F.lit(0).cast("long").alias("level")
        ).where(F.lit(False))
    out = out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("level").cast("long").alias("level"),
    )
    return TopoResult(out, rounds, cyclic_rest == 0, metrics)
