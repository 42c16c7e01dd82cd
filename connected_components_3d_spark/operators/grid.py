"""Grid-fixture frontend: cc3d parity path (SURVEY.md §2.3, FIXTURES.md §3).

The reference labels dense 2D/3D grids where edges are IMPLICIT — two voxels
are connected iff they are stencil neighbors (6/18/26-connectivity in 3D,
4/8 in 2D) AND carry the same non-background value (multilabel rule)
[cc3d:`cc3d.hpp` — UNVERIFIED; /root/reference empty, SURVEY.md §0].

Here a grid is a long-format DataFrame ``grid(x:int, y:int, z:int,
value:long[, fvalue:double])``; value=0 is background. Stencil edges are
generated RELATIONALLY: broadcast the (≤13-row) positive-offset table, derive
neighbor coordinates, equi-join the grid back to itself — all predicate-
pushable, codegen'd native expressions. Modes map exactly onto the
reference's flags:

  multilabel (default)     a.value == b.value           (R1)
  binary_image=True        both nonzero                 (R5)
  delta > 0 (continuous)   |a.fvalue − b.fvalue| ≤ δ    (R4)
  periodic_boundary=True   neighbor coords wrap mod shape (R6)

Vertex id = x + X*(y + Y*z) (Fortran-order offset, matching the reference's
memory order; parity is checked on equivalence classes so only determinism
matters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# positive-lexicographic half of each stencil (the join symmetrizes)
_OFFSETS_26 = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) > (0, 0, 0) or (dx, dy, dz) < (0, 0, 0)
]
_POS_26 = [o for o in _OFFSETS_26 if o > (0, 0, 0)]
_POS_18 = [o for o in _POS_26 if abs(o[0]) + abs(o[1]) + abs(o[2]) <= 2]
_POS_6 = [o for o in _POS_26 if abs(o[0]) + abs(o[1]) + abs(o[2]) == 1]
# 2D stencils (z ignored)
_POS_8 = [o for o in _POS_26 if o[2] == 0]
_POS_4 = [o for o in _POS_6 if o[2] == 0]

_STENCILS = {26: _POS_26, 18: _POS_18, 6: _POS_6, 8: _POS_8, 4: _POS_4}


def grid_from_array(spark: SparkSession, arr: np.ndarray) -> DataFrame:
    """Dense numpy array (x,y,z order) → long-format grid DataFrame.
    2D arrays get z=0. Test-fixture helper (driver-side, small grids only)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    xs, ys, zs = np.nonzero(np.ones_like(arr, dtype=bool))
    vals = arr[xs, ys, zs]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "x": xs.astype(np.int32),
            "y": ys.astype(np.int32),
            "z": zs.astype(np.int32),
            "value": vals.astype(np.int64)
            if not np.issubdtype(arr.dtype, np.floating)
            else np.zeros(len(xs), dtype=np.int64),
        }
    )
    if np.issubdtype(arr.dtype, np.floating):
        pdf["fvalue"] = vals.astype(np.float64)
        pdf["value"] = (vals != 0).astype(np.int64)  # nonzero mask for background
    return spark.createDataFrame(pdf)


def grid_vertex_id(shape: tuple[int, int, int]):
    X, Y, _ = shape
    return (F.col("x") + X * (F.col("y") + Y * F.col("z"))).cast("long")


def stencil_edges(
    spark: SparkSession,
    grid: DataFrame,
    shape: tuple[int, int, int],
    connectivity: int = 26,
    *,
    binary_image: bool = False,
    delta: float = 0.0,
    periodic_boundary: bool = False,
) -> DataFrame:
    """grid → explicit edges(src, dst) under the chosen stencil + mode."""
    if connectivity not in _STENCILS:
        raise ValueError(f"connectivity must be one of {sorted(_STENCILS)}")
    X, Y, Z = shape
    fg = grid.where(F.col("value") != 0)
    offsets = spark.createDataFrame(
        [{"dx": dx, "dy": dy, "dz": dz} for dx, dy, dz in _STENCILS[connectivity]]
    )
    a = fg.select(
        F.col("x"),
        F.col("y"),
        F.col("z"),
        F.col("value").alias("va"),
        *([F.col("fvalue").alias("fa")] if "fvalue" in grid.columns else []),
    ).crossJoin(F.broadcast(offsets))
    nx, ny, nz = (
        F.col("x") + F.col("dx"),
        F.col("y") + F.col("dy"),
        F.col("z") + F.col("dz"),
    )
    if periodic_boundary:
        nx, ny, nz = F.pmod(nx, F.lit(X)), F.pmod(ny, F.lit(Y)), F.pmod(nz, F.lit(Z))
    a = a.select(
        grid_vertex_id(shape).alias("src"),
        nx.cast("int").alias("x"),
        ny.cast("int").alias("y"),
        nz.cast("int").alias("z"),
        "va",
        *(["fa"] if "fa" in a.columns else []),
    )
    b = fg.select(
        "x",
        "y",
        "z",
        F.col("value").alias("vb"),
        *([F.col("fvalue").alias("fb")] if "fvalue" in grid.columns else []),
        grid_vertex_id(shape).alias("dst"),
    )
    joined = a.join(b, ["x", "y", "z"])
    if delta > 0:
        pred = F.abs(F.col("fa") - F.col("fb")) <= F.lit(float(delta))
    elif binary_image:
        pred = F.lit(True)  # both sides already foreground
    else:
        pred = F.col("va") == F.col("vb")  # multilabel rule
    return (
        joined.where(pred)
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


# --------------------------------------------------------------------------
# dense slab kernel (pass-1): the reference's contiguous memory-order pass,
# distributed — each slab is reconstructed as a dense numpy array and labeled
# with the vectorized union-find from cc.py; only (vertex → min-gid-root)
# stars leave the kernel, so Spark never materializes the ~13·V stencil edge
# rows that made the relational path ~10^3× more work per voxel.
# --------------------------------------------------------------------------


def _pair_slices(n: int, d: int) -> tuple[slice, slice]:
    """Slices (a, b) s.t. a[i] pairs with b[i] ⇔ voxel pairs offset by +d."""
    if d >= 0:
        return slice(0, n - d), slice(d, n)
    return slice(-d, n), slice(0, n + d)


def _dense_slab_stars(
    kshape: tuple[int, int, int],
    offsets: list[tuple[int, int, int]],
    *,
    binary_image: bool,
    delta: float,
    periodic: bool,
    has_fvalue: bool,
):
    """Build the mapInPandas kernel: one partition's rows → star rows.

    Rows carry kernel-frame coords (a0, a1, zl) — slab axis last — plus the
    precomputed global vertex id ``gid`` (halo planes keep their ORIGINAL
    gid, which is what stitches slabs together: a halo voxel's stars from two
    slabs share the gid, so the root graph merges across the face). Each
    dense slab is at most A0·A1·(depth+1) cells — ``num_slabs`` is the
    executor-memory knob at scale."""
    A0, A1, _ = kshape

    def kernel(it):
        parts = list(it)
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        if not len(pdf):
            return
        for _, g in pdf.groupby("slab", sort=False):
            a0 = g["a0"].to_numpy(np.int64)
            a1 = g["a1"].to_numpy(np.int64)
            zl = g["zl"].to_numpy(np.int64)
            D = int(zl.max()) + 1
            n = A0 * A1 * D
            val = np.zeros((A0, A1, D), dtype=np.int64)
            val[a0, a1, zl] = g["value"].to_numpy(np.int64)
            gid = np.full((A0, A1, D), -1, dtype=np.int64)
            gid[a0, a1, zl] = g["gid"].to_numpy(np.int64)
            own = np.zeros((A0, A1, D), dtype=bool)
            own[a0, a1, zl] = g["owner"].to_numpy(bool)
            fac = np.zeros((A0, A1, D), dtype=bool)
            fac[a0, a1, zl] = g["face"].to_numpy(bool)
            fv = None
            if has_fvalue:
                fv = np.zeros((A0, A1, D), dtype=np.float64)
                fv[a0, a1, zl] = g["fvalue"].to_numpy(np.float64)
            us, vs = [], []
            for d0, d1, dz in offsets:
                za, zb = _pair_slices(D, dz)
                if periodic:
                    # wrap in the two in-slab axes via roll; the slab axis
                    # wraps through the duplicated halo plane instead
                    av = val[:, :, za]
                    rolled = np.roll(np.roll(val, -d0, axis=0), -d1, axis=1)
                    bv = rolled[:, :, zb]
                else:
                    s0a, s0b = _pair_slices(A0, d0)
                    s1a, s1b = _pair_slices(A1, d1)
                    av = val[s0a, s1a, za]
                    bv = val[s0b, s1b, zb]
                mask = (av != 0) & (bv != 0)
                if delta > 0:
                    if periodic:
                        fa = fv[:, :, za]
                        fb = np.roll(np.roll(fv, -d0, axis=0), -d1, axis=1)[:, :, zb]
                    else:
                        fa = fv[s0a, s1a, za]
                        fb = fv[s0b, s1b, zb]
                    mask &= np.abs(fa - fb) <= delta
                elif not binary_image:
                    mask &= av == bv
                i0, i1, i2 = np.nonzero(mask)
                if not len(i0):
                    continue
                if periodic:
                    u = (i0 * A1 + i1) * D + (i2 + za.start)
                    v = (((i0 + d0) % A0) * A1 + ((i1 + d1) % A1)) * D + (
                        i2 + zb.start
                    )
                else:
                    u = ((i0 + s0a.start) * A1 + (i1 + s1a.start)) * D + (
                        i2 + za.start
                    )
                    v = ((i0 + s0b.start) * A1 + (i1 + s1b.start)) * D + (
                        i2 + zb.start
                    )
                us.append(u)
                vs.append(v)
            from .cc import _uf_fixpoint

            parent = np.arange(n, dtype=np.int64)
            if us:
                parent = _uf_fixpoint(
                    parent, np.concatenate(us), np.concatenate(vs)
                )
            val_f = val.ravel()
            gid_f = gid.ravel()
            f = np.flatnonzero(val_f != 0)
            p = parent[f]
            gv = gid_f[f]
            # root = min GLOBAL id of the local component (NOT min local flat
            # index: a periodic wrap-halo plane sits at the END of the local
            # array but carries the SMALLEST gids — min-gid keeps component
            # labels canonical through the global stage)
            rg = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(rg, p, gv)
            yield pd.DataFrame(
                {
                    "vertex": gv,
                    "root": rg[p],
                    "owner": own.ravel()[f],
                    "face": fac.ravel()[f],
                }
            )

    return kernel


def dense_grid_stars(
    spark: SparkSession,
    grid: DataFrame,
    shape: tuple[int, int, int],
    connectivity: int = 26,
    *,
    binary_image: bool = False,
    delta: float = 0.0,
    periodic_boundary: bool = False,
    num_slabs: int | None = None,
) -> DataFrame:
    """Pass-1 contraction: foreground grid → (vertex, root, owner, face)
    star set whose union has exactly the grid's stencil components; the
    owner/face tags let cc.components_from_stars aggregate only halo-plane
    vertices in pass 2 (interior rows — the O(V) bulk — are never shuffled
    again, which is what multi-executor grid scaling was bound on).

    Slabs are cut along the LONGEST axis (the gate fixtures are 1-D along x;
    volumes slab along z) and each slab gets a one-plane halo from its
    successor — every stencil edge (|offset component| ≤ 1) is then interior
    to at least one slab, so the star union is a valid contraction for any
    slab count (slab-count invariance is pytest-pinned). Periodic wrap along
    the slab axis ships plane 0 to the last slab as an extra halo plane; the
    in-slab axes wrap inside the kernel."""
    if connectivity not in _STENCILS:
        raise ValueError(f"connectivity must be one of {sorted(_STENCILS)}")
    axis = max(range(3), key=lambda i: shape[i])
    order = [i for i in range(3) if i != axis] + [axis]
    names = ["x", "y", "z"]
    A0, A1, L = (shape[i] for i in order)
    offsets = [(o[order[0]], o[order[1]], o[order[2]]) for o in _STENCILS[connectivity]]

    if num_slabs is None:
        num_slabs = max(spark.sparkContext.defaultParallelism, 8)
    num_slabs = max(min(num_slabs, L), 1)
    depth = -(-L // num_slabs)  # ceil
    num_slabs = -(-L // depth)
    last_depth = L - (num_slabs - 1) * depth

    has_f = "fvalue" in grid.columns
    axc = F.col(names[axis])
    base = grid.where(F.col("value") != 0).select(
        F.col(names[order[0]]).cast("int").alias("a0"),
        F.col(names[order[1]]).cast("int").alias("a1"),
        axc.cast("int").alias("ax"),
        F.col("value"),
        *([F.col("fvalue")] if has_f else []),
        grid_vertex_id(shape).alias("gid"),
    )
    slab = (F.col("ax") / depth).cast("int")
    # owner/face tags (consumed by cc.components_from_stars' fast path):
    # owner = the ONE authoritative row per vertex (its main-piece row);
    # face = the vertex is duplicated across slab partitions (halo plane, or
    # the periodic wrap copy of plane 0) — only face vertices can carry >1
    # root, so pass-2 aggregates face rows only (a few % of V).
    is_face = (F.col("ax") % depth == 0) & (F.col("ax") > 0)
    if periodic_boundary and L > 1:
        is_face = is_face | (F.col("ax") == 0)
    main = base.select(
        "*",
        slab.alias("slab"),
        (F.col("ax") - slab * depth).alias("zl"),
        F.lit(True).alias("owner"),
        is_face.alias("face"),
    )
    pieces = [main]
    # halo: each slab's successor face plane, placed one past its last plane
    halo = base.where((F.col("ax") % depth == 0) & (F.col("ax") > 0)).select(
        "*",
        (slab - 1).alias("slab"),
        F.lit(depth).alias("zl"),
        F.lit(False).alias("owner"),
        F.lit(True).alias("face"),
    )
    pieces.append(halo)
    if periodic_boundary and L > 1:
        wrap = base.where(F.col("ax") == 0).select(
            "*",
            F.lit(num_slabs - 1).alias("slab"),
            F.lit(last_depth).alias("zl"),
            F.lit(False).alias("owner"),
            F.lit(True).alias("face"),
        )
        pieces.append(wrap)
    rows = pieces[0]
    for p_ in pieces[1:]:
        rows = rows.unionByName(p_)
    rows = rows.select(
        "a0",
        "a1",
        "zl",
        "slab",
        "value",
        *(["fvalue"] if has_f else []),
        "gid",
        "owner",
        "face",
    )
    kernel = _dense_slab_stars(
        (A0, A1, depth + 1),
        offsets,
        binary_image=binary_image,
        delta=delta,
        periodic=periodic_boundary,
        has_fvalue=has_f and delta > 0,
    )
    schema = "vertex long, root long, owner boolean, face boolean"
    return rows.repartition(num_slabs, "slab").mapInPandas(kernel, schema=schema)


def grid_components(
    spark: SparkSession,
    grid: DataFrame,
    shape: tuple[int, int, int],
    connectivity: int = 26,
    *,
    binary_image: bool = False,
    delta: float = 0.0,
    periodic_boundary: bool = False,
    method: str = "hashmin",
    impl: str = "dense",
    num_slabs: int | None = None,
):
    """Full reference-equivalent labeling: (vertex, component) over foreground
    voxels, INCLUDING isolated foreground voxels as singleton components
    (background value=0 is dropped, never labeled — R1 semantics).

    impl="dense" (default): dense numpy slab kernel + root-graph fixpoint —
    the scale path (no 13·V edge materialization). impl="relational": the
    original stencil-join → CC pipeline, kept as an independent in-engine
    oracle (dense ≡ relational is pytest-pinned). ``method`` selects the CC
    kernel on the relational path; the dense path's global stage is always
    hash-min on the (tiny) cross-slab root graph."""
    if impl == "dense":
        from .cc import components_from_stars

        stars = dense_grid_stars(
            spark,
            grid,
            shape,
            connectivity,
            binary_image=binary_image,
            delta=delta,
            periodic_boundary=periodic_boundary,
            num_slabs=num_slabs,
        )
        return components_from_stars(spark, stars)  # already materialized
    if impl != "relational":
        raise ValueError(f"unknown impl {impl!r}")
    from .cc import connected_components

    edges = stencil_edges(
        spark,
        grid,
        shape,
        connectivity,
        binary_image=binary_image,
        delta=delta,
        periodic_boundary=periodic_boundary,
    )
    # The stencil join is consumed by several actions inside the CC kernel
    # (pack-range agg, contraction, fingerprint, final compose) — persist it
    # once (columnar cache feeds the Arrow contraction ~4x faster than a row
    # cache) and release it after materializing the result.
    edges = edges.persist()
    # Fortran-order vertex ids encode spatial locality → range-partitioned
    # contraction blocks are slabs that solve internally (cc.py block_key)
    res = connected_components(
        spark, edges, method=method, block_key="range"
    )
    allfg = grid.where(F.col("value") != 0).select(
        grid_vertex_id(shape).alias("vertex")
    )
    out = (
        allfg.join(res.components, "vertex", "left")
        .select(
            "vertex", F.coalesce("component", F.col("vertex")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    return out


def synthetic_grid(
    spark: SparkSession,
    shape: tuple[int, int, int],
    n_labels: int = 4,
    density_pct: int = 90,
    seed: int = 7,
) -> DataFrame:
    """Seed-fixed dense multilabel volume, generated with native expressions
    only (no driver-side arrays — scales to any shape): voxel id decodes to
    (x, y, z) in Fortran order; ``density_pct``% of voxels are foreground
    with labels 1..n_labels from xxhash64. The volume bench path
    (bench.py grid_cc) measures the reference's own metric — voxels/sec —
    through the full stencil-edge → CC pipeline."""
    X, Y, Z = shape
    n = X * Y * Z
    df = spark.range(n, numPartitions=max(spark.sparkContext.defaultParallelism, 8))
    h1 = F.xxhash64("id", F.lit(seed))
    h2 = F.xxhash64("id", F.lit(seed + 1))
    value = F.when(
        F.pmod(h1, F.lit(100)) < F.lit(density_pct),
        (F.lit(1) + F.pmod(h2, F.lit(n_labels))).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return df.select(
        F.pmod("id", F.lit(X)).cast("int").alias("x"),
        F.pmod((F.col("id") / X).cast("long"), F.lit(Y)).cast("int").alias("y"),
        (F.col("id") / (X * Y)).cast("long").cast("int").alias("z"),
        value.alias("value"),
    )
