"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_brute``: exact top-k neighbors per query vector via an
  all-pairs join — the correctness baseline (oracle-comparable: the dot
  product is a sequential left-fold over double-cast elements, so Spark and
  duckdb produce bit-identical sums; ranking ties break on (rounded cosine
  desc, id asc) so the selected SET is engine-stable).
- ``cosine_topk_lsh``: random-hyperplane LSH bucketing — the scale path.
  Buckets are deterministic (hyperplane signs derived from md5(plane, dim)),
  candidates are same-bucket pairs, exact cosine re-ranks within bucket.
  At 100 TB you shard buckets (they're the shuffle key) and probe multiple
  tables; here one table + optional multi-probe by flipping one bit.

No UDFs: zip_with/aggregate are codegen'd JVM lambdas over the Arrow-backed
array column (SURVEY.md "stay JVM-side").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold Σ aᵢ·bᵢ in double — order-stable across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    # small parquet inputs arrive as one scan partition; spread the
    # dot-product-heavy stages across cores (no-op on wide scans)
    sc = emb.sparkSession.sparkContext
    if emb.rdd.getNumPartitions() < sc.defaultParallelism:
        emb = emb.repartition(sc.defaultParallelism)
    v = F.col(vec_col)
    return emb.select(
        F.col(id_col).alias("id"), v.alias("vec"), F.sqrt(_dot(v, v)).alias("norm")
    )


def cosine_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    brute_max_rows: int = 100_000,
) -> DataFrame:
    """All ordered pairs (id_a != id_b) with rounded cosine. O(n²) — baseline
    only; callers at scale go through the LSH path (``lsh_cosine_pairs``).
    Refuses inputs above ``brute_max_rows`` (same guard as
    ``operators.density.dbscan``) so the quadratic cross join can never run
    silently on a large table — raise the threshold to opt in deliberately.
    """
    n = emb.count()
    if n > brute_max_rows:
        raise ValueError(
            f"cosine_pairs: {n} input rows exceed brute_max_rows="
            f"{brute_max_rows}; this is the O(n²) exact baseline. Use"
            " lsh_cosine_pairs / cosine_topk_lsh / cosine_topk_ivf at"
            " scale, or raise brute_max_rows deliberately."
        )
    base = with_norm(emb, vec_col, id_col)
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
    )


def cosine_topk_brute(
    emb: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    brute_max_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k neighbors per vector: (id_a, id_b, cos, rn). O(n²)
    baseline — guarded by ``brute_max_rows`` (see cosine_pairs)."""
    pairs = cosine_pairs(emb, vec_col, id_col, brute_max_rows=brute_max_rows)
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    brute_max_rows: int = 100_000,
) -> DataFrame:
    """Unordered near-duplicate pairs by cosine ≥ threshold (id_a < id_b).
    O(n²) baseline — guarded by ``brute_max_rows`` (see cosine_pairs)."""
    return cosine_pairs(emb, vec_col, id_col, brute_max_rows=brute_max_rows).where(
        (F.col("cos") >= threshold) & (F.col("id_a") < F.col("id_b"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------


def _hyperplane_sign(vec: Column, table: int, plane: int) -> Column:
    """sign(Σᵢ vᵢ·hᵢ) with hᵢ = ±1 from md5('<table>_<plane>_<i>') —
    deterministic pseudo-hyperplane, identical under any partitioning
    (no RNG state)."""
    high = list("89abcdef")
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: x.cast("double")
            * F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{table}_{plane}_"), i.cast("string"))),
                    1,
                    1,
                ).isin(high),
                1.0,
            ).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_buckets(
    emb: DataFrame,
    num_planes: int = 8,
    num_tables: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec, norm, table, bucket) — per LSH table, bucket = sign bits of
    ``num_planes`` hyperplane projections. Multiple independent tables are
    the standard recall amplifier: P(collide in ≥1 table) = 1-(1-p^b)^L."""
    base = with_norm(emb, vec_col, id_col)
    per_table = []
    for t in range(num_tables):
        bucket = F.lit(0)
        for p in range(num_planes):
            bucket = bucket + _hyperplane_sign(F.col("vec"), t, p) * (1 << p)
        per_table.append(
            base.withColumn("table", F.lit(t)).withColumn(
                "bucket", bucket.cast("int")
            )
        )
    out = per_table[0]
    for df in per_table[1:]:
        out = out.unionByName(df)
    return out


def ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse quantizer, scale-safe (VERDICT r1 #3): hash-mod
    sampling keeps ~4·n_cells candidate rows (sized by one
    approx_count_distinct pass — no exact count, no global ordering), then
    ``orderBy(id).limit`` compiles to TakeOrderedAndProject (per-partition
    top-k + driver merge of n_cells rows). No partitionless Window anywhere;
    deterministic and partition-invariant because both the hash filter and
    the id order are data-only. (A k-means refine would drop in here at
    scale; the IVF plumbing is identical.)"""
    n = emb.agg(F.approx_count_distinct(id_col).alias("n")).collect()[0]["n"]
    divisor = max(n // (4 * n_cells), 1)
    cand = emb.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(divisor)) == 0)
    return (
        cand.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )


def ivf_centroids_kmeans(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-refined coarse quantizer: hash-mod seeds (ivf_centroids) then
    ``iters`` distributed k-means steps. Relational shape, no UDFs:
    assignment = broadcast(centroids) ⋈ vectors with a codegen'd dot fold +
    max_by argmax (ties → smallest cid); update = posexplode to
    (cell, dim, val) rows → partial-aggregated avg per (cell, dim) → arrays
    rebuilt by sorting (dim, mean) structs. The shuffle per step carries only
    cells×dim partial sums — the 64× explode never crosses the wire.

    Means are rounded to 6 decimals so double-sum reassociation cannot leak
    into the result: centroids are partition-invariant in practice
    (property-tested). Cells that lose every member drop out (fewer, denser
    cells); probing all remaining cells still degenerates to exact brute
    force, which keeps the full-probe ≡ brute invariant for any ``iters``.
    """
    cents = ivf_centroids(emb, n_cells, vec_col, id_col).localCheckpoint()
    base = with_norm(emb, vec_col, id_col)
    for _ in range(iters):
        scored = base.crossJoin(F.broadcast(cents)).select(
            "id", _dot(F.col("vec"), F.col("cvec")).alias("proj"), "cid"
        )
        best = scored.groupBy("id").agg(
            F.max_by(
                "cid", F.struct(F.col("proj"), (-F.col("cid")).alias("nc"))
            ).alias("cell")
        )
        assigned = best.join(base, "id")
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
        )
        cents = (
            means.groupBy(F.col("cell").alias("cid"))
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda x: x["m"],
                ).alias("cvec")
            )
            .localCheckpoint()
        )
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec, norm, cell): each vector assigned to its max-cosine centroid
    (ties → smallest centroid id; deterministic). Broadcast the (tiny)
    centroid table; the scoring is a codegen'd fold per pair."""
    base = with_norm(emb, vec_col, id_col)
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "id",
        "vec",
        "norm",
        "cid",
        (_dot(F.col("vec"), F.col("cvec"))).alias("proj"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("proj"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "vec", "norm", F.col("cid").alias("cell"))
    )


def cosine_topk_ivf(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: assign vectors to coarse cells, probe each query's
    ``n_probe`` closest cells, exact-cosine re-rank within the probed set.

    ``n_probe == n_cells`` degenerates to exact brute force (property-tested
    against cosine_topk_brute). At scale the candidate join shuffles on
    ``cell`` — the partitioning key of the inverted file — so each cell's
    postings co-locate; recall/work trades via (n_cells, n_probe).
    ``refine_iters > 0`` runs that many distributed Lloyd steps on the
    quantizer (ivf_centroids_kmeans) — denser cells, better recall per probe.
    """
    if refine_iters > 0:
        cents = ivf_centroids_kmeans(
            emb, n_cells, refine_iters, vec_col, id_col
        ).localCheckpoint()
    else:
        cents = ivf_centroids(emb, n_cells, vec_col, id_col).localCheckpoint()
    assigned = ivf_assign(emb, cents, vec_col, id_col).localCheckpoint(eager=False)

    # per query: its n_probe best cells (by centroid projection)
    base = with_norm(emb, vec_col, id_col)
    probes = base.crossJoin(F.broadcast(cents)).select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("norm").alias("na"),
        "cid",
        _dot(F.col("vec"), F.col("cvec")).alias("proj"),
    )
    wp = Window.partitionBy("id_a").orderBy(F.desc("proj"), F.asc("cid"))
    probed = (
        probes.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("id_a", "va", "na", F.col("cid").alias("cell"))
    )
    cand = probed.join(
        assigned.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("norm").alias("nb"),
            "cell",
        ),
        "cell",
    ).where(F.col("id_a") != F.col("id_b"))
    pairs = cand.select(
        "id_a",
        "id_b",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cos"),
    ).dropDuplicates(["id_a", "id_b"])
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def lsh_cosine_pairs(
    emb: DataFrame,
    num_planes: int = 6,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH candidate pairs with exact cosine — (id_a, id_b, cos) for every
    ordered pair sharing a bucket in ANY of ``num_tables`` tables (both
    directions present, like ``cosine_pairs``; ROUND(cos,6) float parity).
    The scale-path pair source for DBSCAN ``pairs=`` and
    ``mutual_nearest_pairs(topk=...)``: candidate generation distributes on
    the (table, bucket) join key instead of the quadratic cross join —
    a subset of cosine_pairs's output, with recall set by the dials
    (planes shrink buckets, tables multiply recall)."""
    b = lsh_buckets(emb, num_planes, num_tables, vec_col, id_col)
    a = b.select("table", "bucket", F.col("id").alias("id_a"))
    c = b.select("table", "bucket", F.col("id").alias("id_b"))
    cand = (
        a.join(c, ["table", "bucket"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    base = with_norm(emb, vec_col, id_col)
    va = base.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
    )


def cosine_topk_lsh(
    emb: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    num_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank over candidates that share a
    bucket in ANY of ``num_tables`` LSH tables (``lsh_cosine_pairs``).

    Work/recall dials: planes shrink buckets (each plane halves expected
    bucket size → the bucket join distributes on (table, bucket)); tables
    multiply recall. Approximate by construction → verified with a recall@k
    floor, not exact parity.
    """
    pairs = lsh_cosine_pairs(emb, num_planes, num_tables, vec_col, id_col)
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


def mutual_nearest_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    topk: DataFrame | None = None,
) -> DataFrame:
    """Reciprocal-best-match pairs — each side is the other's TOP-1 cosine
    neighbor (ties by smaller id, the cosine_topk_brute order). The
    standard high-precision pairing rule for corpus alignment / bitext
    mining (Artetxe & Schwenk's margin-free ancestor) and the strictest
    near-duplicate pairing: mutuality filters the hubness false positives
    a one-sided top-1 admits.

    Output: (id_a, id_b, cos) with id_a < id_b, one row per mutual pair.
    Composition: top-1 per id, then a self-join keeping pairs appearing in
    both directions.

    ``topk`` is the pluggable neighbor source (same seam as DBSCAN's
    ``pairs=``): any (id_a, id_b, cos) DataFrame — e.g.
    ``cosine_topk_lsh(...)`` or ``cosine_topk_ivf(...)`` at scale; the
    per-id top-1 is re-derived here so callers may pass k>1 candidates.
    Default None runs the exact brute path (O(n²) — oracle baseline only;
    do not default this at scale)."""
    if topk is None:
        topk = cosine_topk_brute(emb, k=1, vec_col=vec_col, id_col=id_col)
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    top1 = (
        topk.select("id_a", "id_b", "cos")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id_a", "id_b", "cos")
    )
    rev = top1.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
    )
    return (
        top1.join(rev, ["id_a", "id_b"], "left_semi")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cos")
    )
