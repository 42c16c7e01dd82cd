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
):
    """Full reference-equivalent labeling: (vertex, component) over foreground
    voxels, INCLUDING isolated foreground voxels as singleton components
    (background value=0 is dropped, never labeled — R1 semantics)."""
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
