"""Strongly connected components of a directed link graph.

THE structural decomposition of a web graph (the bowtie: giant SCC + IN +
OUT + tendrils). Undirected CC (operators/cc.py O6) can't see direction;
this operator closes that gap with the standard distributed SCC recipe —
trimming + forward-min coloring (Orzan-style coloring / FW-BW hybrid, the
published Pregel-family approach) — expressed as DataFrame joins and
aggregations, no windows, no per-row Python.

Outer loop over the ACTIVE subgraph (vertices not yet assigned):

  1. TRIM: a vertex with in-degree 0 or out-degree 0 in the active subgraph
     cannot lie on a cycle → it is a singleton SCC. Peel iteratively (each
     peel exposes new sources/sinks). On real web graphs this removes the
     tendril mass cheaply before any propagation runs.
  2. COLOR (forward min-label fixpoint): col(v) ← min id that reaches v,
     propagated along edges to fixpoint — same superstep shape as one CC
     hash-min round (vertex-sized shuffle per step).
  3. HARVEST: every nonempty color class is owned by its root m (col(m)=m;
     proof sketch: col(v)=m requires no id < m to reach v, so none reaches
     m either). SCC(m) = vertices of the class that reach m THROUGH the
     class — a backward fixpoint seeded at the roots, edges filtered to
     equal-color endpoints. Assign those, drop them, repeat.

Every removed-per-round set contains at least each surviving class's root
SCC, so the outer loop terminates; all reductions are mins/counts, so the
result is deterministic and partition-invariant. Peak state is the active
edge table (re-persisted, shrinking) plus two vertex-sized frames.

Scale notes (100 TB regime): per inner step the shuffle is vertex-sized
(col updates) over an edge-shaped join — identical cost envelope to the CC
kernel the bench gates; the giant SCC falls in the first coloring round;
long-chain adversarial graphs degrade the same way they do for every
published label-propagation SCC (depth-bounded propagation), which the
docstring declares rather than hides.

Output: ``(vertex:long, component:long)`` — component = min member id,
canonical and hash-comparable against the DuckDB mutual-reachability oracle
(recursive-CTE transitive closure) in the driver gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class SCCResult:
    components: DataFrame  # (vertex:long, component:long)
    num_outer_rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_outer: int = 100,
) -> SCCResult:
    """SCCs of the DIRECTED simple graph (duplicate edges and self-loops
    dropped; an isolated self-loop vertex is its own SCC, like every
    vertex is).

    Raises ``RuntimeError`` if ``max_outer`` rounds don't assign every
    vertex — a partial vertex→component map is never returned.
    """
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e_cast = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    e_all = (
        e_cast.where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
        .persist()
    )
    # vertex set from the UNFILTERED edges: a vertex whose only edge is a
    # self-loop has no e_all edge, so trim round 1 assigns it a singleton
    # SCC — matching the docstring (and networkx) semantics
    verts = _truncate(vertices(e_cast))

    assigned_parts: list[DataFrame] = []
    active_v = verts
    active_e = e_all
    metrics: list[dict] = []
    outer = 0
    converged = False
    for outer in range(1, max_outer + 1):
        m = {"outer": outer, "trim_rounds": 0, "fwd_steps": 0, "bwd_steps": 0}
        # ---- 1. trim singleton SCCs (no in- or no out-edge in active) ----
        while True:
            has_out = active_e.select(F.col("src").alias("vertex")).distinct()
            has_in = active_e.select(F.col("dst").alias("vertex")).distinct()
            cyclic = _truncate(has_out.join(has_in, "vertex", "inner"))
            trivial = active_v.join(cyclic, "vertex", "left_anti")
            n_trivial = trivial.count()
            if n_trivial == 0:
                break
            m["trim_rounds"] += 1
            assigned_parts.append(
                _truncate(
                    trivial.select("vertex", F.col("vertex").alias("component"))
                )
            )
            active_v = cyclic
            nxt = (
                active_e.join(
                    cyclic.withColumnRenamed("vertex", "src"), "src", "left_semi"
                )
                .join(
                    cyclic.withColumnRenamed("vertex", "dst"), "dst", "left_semi"
                )
                .repartition(p, "src")
                .persist()
            )
            nxt.count()
            if active_e is not e_all:
                active_e.unpersist()
            active_e = nxt
        n_active = active_v.count()
        m["active_after_trim"] = n_active
        if n_active == 0:
            converged = True
            metrics.append(m)
            break
        # ---- 2. forward min-label coloring to fixpoint ----
        col = _truncate(active_v.select("vertex", F.col("vertex").alias("col")))
        while True:
            upd = (
                active_e.join(
                    col.select(F.col("vertex").alias("src"), "col"), "src"
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.min("col").alias("new_col"))
            )
            nxt_col = col.join(upd, "vertex", "left").select(
                "vertex",
                F.least(F.col("col"), F.coalesce("new_col", F.col("col"))).alias(
                    "col"
                ),
                (F.coalesce("new_col", F.col("col")) < F.col("col")).alias("_chg"),
            )
            nxt_col = _truncate(nxt_col)
            changed = nxt_col.agg(
                F.sum(F.col("_chg").cast("int")).alias("c")
            ).collect()[0]["c"]
            col = nxt_col.select("vertex", "col")
            m["fwd_steps"] += 1
            if not changed:
                break
        # ---- 3. backward fixpoint within color classes, seeded at roots --
        # equal-color edges only: u -> w with col(u) == col(w)
        ec = _truncate(
            active_e.join(
                col.select(F.col("vertex").alias("src"), F.col("col").alias("cs")),
                "src",
            )
            .join(
                col.select(F.col("vertex").alias("dst"), F.col("col").alias("cd")),
                "dst",
            )
            .where(F.col("cs") == F.col("cd"))
            .select("src", "dst")
        )
        done = _truncate(
            col.where(F.col("vertex") == F.col("col")).select("vertex", "col")
        )
        while True:
            new = (
                ec.join(
                    done.select(F.col("vertex").alias("dst"), "col"), "dst"
                )
                .select(F.col("src").alias("vertex"), "col")
                .distinct()
                .join(done, "vertex", "left_anti")
            )
            new = _truncate(new)
            n_new = new.count()
            m["bwd_steps"] += 1
            if n_new == 0:
                break
            done = _truncate(done.unionAll(new))
        assigned_parts.append(
            done.select("vertex", F.col("col").alias("component"))
        )
        # ---- remove harvested SCCs; next outer round ----
        active_v = _truncate(active_v.join(done, "vertex", "left_anti"))
        nxt = (
            active_e.join(
                active_v.withColumnRenamed("vertex", "src"), "src", "left_semi"
            )
            .join(
                active_v.withColumnRenamed("vertex", "dst"), "dst", "left_semi"
            )
            .repartition(p, "src")
            .persist()
        )
        nxt.count()
        if active_e is not e_all:
            active_e.unpersist()
        active_e = nxt
        metrics.append(m)
        if active_v.count() == 0:
            converged = True
            break
    if active_e is not e_all:
        active_e.unpersist()
    e_all.unpersist()
    if not converged:
        raise RuntimeError(
            f"strongly_connected_components: max_outer={max_outer} rounds "
            "exhausted with vertices still unassigned — raise max_outer "
            "(a partial vertex->component map is never returned)"
        )
    if not assigned_parts:  # empty graph (no edges at all)
        empty = verts.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.col("vertex").cast("long").alias("component"),
        )
        return SCCResult(empty, outer, converged, metrics)
    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionAll(part)
    out = out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("component").cast("long").alias("component"),
    )
    return SCCResult(out, outer, converged, metrics)
