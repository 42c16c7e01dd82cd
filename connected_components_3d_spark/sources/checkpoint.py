"""Superstep checkpointing with per-partition lineage + metrics (north rule:
"resumable from checkpoint with per-partition lineage + metrics"
[BASELINE.json:14]).

Layout (Iceberg-snapshot-shaped — data files + a metadata manifest — so
swapping in real Iceberg is a sink-config change, not a redesign; no Iceberg
runtime jars exist in this sandbox, SURVEY.md §0/§4.4)::

    <ckpt_dir>/step=<k>/data/part-*.parquet      labels / frontier state
    <ckpt_dir>/step=<k>/_manifest.json           snapshot metadata

Manifest fields: step, rows, schema, per-file lineage (name, bytes, md5),
engine metrics (labels_changed, edges_active, wall_s, edges_per_sec), and a
``committed`` flag written LAST — a crash mid-write leaves no committed
manifest, so resume (= scan for largest committed step) is safe. Writes go
to a temp dir then atomically rename, making re-runs of a step idempotent.

At 100 TB scale the md5-per-file lineage would be replaced by Iceberg's own
snapshot/manifest chain (file-level stats come free from the commit); the
layout here keeps that contract at sandbox scale with plain parquet.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step={step}")


def _lineage_files(data_dir: str) -> list[dict[str, Any]]:
    """Recursive per-file lineage (relative path, bytes, md5) — walks nested
    layouts (a format may write subdirectories), skipping Spark's
    _SUCCESS/.crc bookkeeping at every level."""
    files = []
    for root, dirs, names in os.walk(data_dir):
        dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
        for name in names:
            if name.startswith(("_", ".")):
                continue
            path = os.path.join(root, name)
            h = hashlib.md5()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            files.append(
                {
                    "file": os.path.relpath(path, data_dir),
                    "bytes": os.path.getsize(path),
                    "md5": h.hexdigest(),
                }
            )
    files.sort(key=lambda e: e["file"])
    return files


def write_checkpoint(
    df: DataFrame,
    ckpt_dir: str,
    step: int,
    metrics: dict[str, Any] | None = None,
    *,
    params: dict[str, Any] | None = None,
    table_format: str = "parquet",
) -> str:
    """Write one superstep's state atomically; returns the step dir.

    ``params`` records the engine configuration the snapshot is only valid
    under (e.g. CC's method + num_blocks): a resume against an incompatible
    configuration must be refused, not silently mis-composed.

    ``table_format`` is the sink-format seam for PATH-BASED file formats
    (parquet/orc/json — anything ``.format(fmt).save(path)`` writes as a
    file layout, nested subdirectories included). A real Iceberg commit is a
    catalog operation (``writeTo(table).append()``), not a path save — that
    integration replaces this module's manifest with Iceberg's own
    snapshot/manifest chain rather than flowing through this seam
    (ADVICE r2 #4). Parquet in-sandbox.
    """
    sdir = _step_dir(ckpt_dir, step)
    tmp = sdir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(sdir):
        shutil.rmtree(sdir)  # idempotent re-run of an uncommitted/stale step
    t0 = time.time()
    df.write.mode("overwrite").format(table_format).save(os.path.join(tmp, "data"))
    files = _lineage_files(os.path.join(tmp, "data"))
    manifest = {
        "step": step,
        "schema": df.schema.jsonValue(),
        "files": files,
        "metrics": dict(metrics or {}),
        "params": dict(params or {}),
        "format": table_format,
        "write_wall_s": round(time.time() - t0, 3),
        "committed": True,
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, sdir)
    return sdir


def read_manifest(ckpt_dir: str, step: int) -> dict[str, Any] | None:
    path = os.path.join(_step_dir(ckpt_dir, step), MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    return m if m.get("committed") else None


def validate_step(ckpt_dir: str, step: int) -> bool:
    """Lineage check: every manifest file exists with matching size+md5."""
    m = read_manifest(ckpt_dir, step)
    if m is None:
        return False
    data_dir = os.path.join(_step_dir(ckpt_dir, step), "data")
    for entry in m["files"]:
        path = os.path.join(data_dir, entry["file"])
        if not os.path.exists(path) or os.path.getsize(path) != entry["bytes"]:
            return False
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != entry["md5"]:
            return False
    return True


def latest_valid_step(ckpt_dir: str) -> int | None:
    """Largest step with a committed, lineage-valid manifest (resume point)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        (
            int(d.split("=", 1)[1])
            for d in os.listdir(ckpt_dir)
            if d.startswith("step=") and not d.endswith(".tmp")
        ),
        reverse=True,
    )
    for s in steps:
        if validate_step(ckpt_dir, s):
            return s
    return None


def clear_steps(ckpt_dir: str) -> int:
    """Remove every step dir (committed or not); returns how many.

    Used when a resume guard detects the snapshots can never be valid for
    the current input (edge-table drift, ADVICE r2 #1/#3): restarting at
    step 0 while HIGHER-numbered stale step dirs survive would let
    ``latest_valid_step`` keep picking the stale snapshot on every later
    invocation, forcing a full recompute each time."""
    if not os.path.isdir(ckpt_dir):
        return 0
    n = 0
    for d in os.listdir(ckpt_dir):
        if d.startswith("step="):
            shutil.rmtree(os.path.join(ckpt_dir, d))
            n += 1
    return n


def read_checkpoint(spark: SparkSession, ckpt_dir: str, step: int) -> DataFrame:
    m = read_manifest(ckpt_dir, step) or {}
    fmt = m.get("format", "parquet")
    return (
        spark.read.format(fmt).load(os.path.join(_step_dir(ckpt_dir, step), "data"))
    )


def compatible_params(
    manifest: dict[str, Any] | None, expected: dict[str, Any]
) -> bool:
    """True iff the snapshot's recorded params don't contradict ``expected``.

    Keys absent from the manifest (pre-params snapshots) are accepted;
    a recorded value that differs from the expected one is a hard mismatch —
    e.g. a blockuf snapshot resumed under method=hashmin, or under a
    different num_blocks (block roots would not reproduce)."""
    recorded = (manifest or {}).get("params") or {}
    return all(
        k not in recorded or recorded[k] == v for k, v in expected.items()
    )
