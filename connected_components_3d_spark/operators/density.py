"""Density-based embedding clustering — DBSCAN (Ester, Kriegel, Sander, Xu
KDD 1996) over a cosine-similarity neighborhood graph: core points have ≥
min_pts neighbors (self-inclusive) within the radius, clusters are the
connected components of the core-core neighborhood graph, border points
attach to a neighboring core's cluster, everything else is noise. On an
embedding table this is the standard "cluster the corpus by semantic
density" primitive — the clustering counterpart of the engine's near-dup
grouping (dedup.py: LSH→Jaccard→CC), and it reuses the same terminal CC
kernel.

Determinism contract (replayed by the single-node reference and the gate
oracle): the neighborhood predicate is ROUND(cosine, 6) ≥ tau — rounding
makes Spark and DuckDB agree on the EDGE SET exactly (similarity.py float
parity) — cluster id = min core id of the component (the CC kernel's label
convention), and a border with several core neighbors attaches to the MIN
cluster id. Classic DBSCAN assigns borders to the first cluster that
visits them (scan-order-dependent — not reproducible across engines);
min-attach is the deterministic refinement, and core/noise sets are
IDENTICAL to classic DBSCAN's.

Scale shape: the default neighbor source is the exact all-pairs cosine
(quadratic — the oracle/baseline path, same stance as cosine_topk_brute),
guarded by ``brute_max_rows`` so it cannot run silently on large inputs;
at scale callers pass ``pairs=`` from the LSH/IVF candidate machinery and
the rest of the pipeline is unchanged: degree count, core filter, CC over
core-core edges (the engine kernel — skew-salted, int-packed), one
border min-attach join. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import cosine_pairs


def dbscan(
    spark: SparkSession,
    emb: DataFrame,
    *,
    tau: float = 0.3,
    min_pts: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pairs: DataFrame | None = None,
    brute_max_rows: int = 100_000,
) -> DataFrame:
    """DBSCAN over cosine neighborhoods: rows (id:long, cluster:long,
    role:string 'core'|'border') — noise points are omitted. ``pairs``
    overrides the quadratic exact pair source with precomputed
    (id_a, id_b, cos) candidates (the LSH scale path — e.g.
    ``similarity.lsh_cosine_pairs``; both directions must be present, as
    cosine_pairs emits). Without ``pairs``, inputs larger than
    ``brute_max_rows`` are refused rather than silently running the O(n²)
    cross join — pass explicit candidates (or raise the threshold
    deliberately) above that size."""
    if min_pts < 1:
        raise ValueError(f"dbscan: min_pts must be >= 1, got {min_pts}")
    from .cc import connected_components

    ids = emb.select(F.col(id_col).cast("long").alias("id")).distinct()
    if pairs is None:
        n = ids.count()
        if n > brute_max_rows:
            raise ValueError(
                f"dbscan: {n} input rows exceed brute_max_rows="
                f"{brute_max_rows} and no pairs= was given; the default"
                " neighbor source is an exact all-pairs cosine (O(n²))."
                " Pass pairs=similarity.lsh_cosine_pairs(emb, ...) (or"
                " another candidate source), or raise brute_max_rows to"
                " opt into the quadratic path deliberately."
            )
    pr = pairs if pairs is not None else cosine_pairs(emb, vec_col, id_col)
    nbr = pr.where(F.col("cos") >= tau).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )
    deg = nbr.groupBy(F.col("id_a").alias("id")).agg(F.count("*").alias("n"))
    core = (
        ids.join(deg, "id", "left")
        .where(F.coalesce("n", F.lit(0)) + 1 >= min_pts)
        .select("id")
    )
    core_edges = (
        nbr.join(core.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(core.select(F.col("id").alias("id_b")), "id_b", "left_semi")
        .where(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comps = connected_components(spark, core_edges, method="hashmin").components
    core_clusters = core.join(
        comps, core.id == comps.vertex, "left"
    ).select(
        "id",
        F.coalesce("component", F.col("id")).alias("cluster"),
        F.lit("core").alias("role"),
    )
    border = (
        nbr.join(core.select(F.col("id").alias("id_a")), "id_a", "left_anti")
        .join(
            core_clusters.select(
                F.col("id").alias("id_b"), F.col("cluster")
            ),
            "id_b",
        )
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
        .select("id", "cluster", F.lit("border").alias("role"))
    )
    return core_clusters.unionByName(border)


def dbscan_single_node(
    vecs: dict[int, list[float]],
    *,
    tau: float = 0.3,
    min_pts: int = 6,
) -> dict[int, tuple[int, str]]:
    """Single-node reference: {id: (cluster, role)} under the module
    docstring contract (ROUND(cos,6) ≥ tau edges, min-id clusters,
    min-attach borders)."""
    import math

    ids = sorted(vecs)
    norm = {i: math.sqrt(sum(x * x for x in vecs[i])) for i in ids}

    def cos(a: int, b: int) -> float:
        d = 0.0
        for x, y in zip(vecs[a], vecs[b]):
            d += float(x) * float(y)
        return round(d / (norm[a] * norm[b]), 6)

    nbrs = {
        a: {b for b in ids if b != a and cos(a, b) >= tau} for a in ids
    }
    core = {a for a in ids if len(nbrs[a]) + 1 >= min_pts}
    # CC over core-core edges (min-id labels)
    cluster: dict[int, int] = {}
    for a in sorted(core):
        if a in cluster:
            continue
        stack, comp = [a], []
        seen = {a}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u] & core:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        g = min(comp)
        for u in comp:
            cluster[u] = g
    out: dict[int, tuple[int, str]] = {
        a: (cluster[a], "core") for a in core
    }
    for a in ids:
        if a in core:
            continue
        cn = nbrs[a] & core
        if cn:
            out[a] = (min(cluster[c] for c in cn), "border")
    return out
