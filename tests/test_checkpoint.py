"""Checkpoint/resume: kill after superstep k → resumed run's final output is
identical to the uninterrupted run; manifests carry lineage + metrics and
detect corruption (FIXTURES.md §4 ckpt_resume; BASELINE.json:14)."""

from __future__ import annotations

import json
import os
import shutil

from connected_components_3d_spark.operators.cc import connected_components
from connected_components_3d_spark.sources import checkpoint as ckpt


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def chain_plus_cliques():
    pairs = [(i, i + 1) for i in range(300)]
    pairs += [(1000 + i, 1000 + j) for i in range(8) for j in range(i + 1, 8)]
    return pairs


def test_checkpoint_manifests_written(spark, tmp_path):
    cdir = str(tmp_path / "ckpt")
    res = connected_components(
        spark, edges_df(spark, chain_plus_cliques()), method="hashmin",
        checkpoint_dir=cdir,
    )
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(cdir) if d.startswith("step=")
    )
    assert steps, "no checkpoints written"
    last = steps[-1]
    m = ckpt.read_manifest(cdir, last)
    assert m["metrics"]["converged"] is True
    assert m["metrics"]["labels_changed"] == 0
    assert "edges_per_sec" in m["metrics"]
    assert all(f["md5"] for f in m["files"])
    assert ckpt.validate_step(cdir, last)
    assert ckpt.latest_valid_step(cdir) == last
    assert res.num_supersteps == last + 1


def test_resume_mid_iteration_identical(spark, tmp_path):
    pairs = chain_plus_cliques()
    full_dir = str(tmp_path / "full")
    res_full = connected_components(
        spark, edges_df(spark, pairs), method="hashmin", checkpoint_dir=full_dir
    )
    want = sorted(map(tuple, res_full.components.collect()))
    assert res_full.num_supersteps >= 3, "fixture too easy to test resume"

    # simulate a crash: copy the checkpoint dir, drop every step after k=1
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(full_dir, crash_dir)
    for d in os.listdir(crash_dir):
        if d.startswith("step=") and int(d.split("=")[1]) > 1:
            shutil.rmtree(os.path.join(crash_dir, d))
    assert ckpt.latest_valid_step(crash_dir) == 1

    res_resumed = connected_components(
        spark, edges_df(spark, pairs), method="hashmin", checkpoint_dir=crash_dir
    )
    got = sorted(map(tuple, res_resumed.components.collect()))
    assert got == want
    # resumed run EXECUTED fewer supersteps (it started at step 2)
    assert len(res_resumed.metrics) < len(res_full.metrics)
    assert res_resumed.metrics[0]["superstep"] == 2


def test_resume_from_converged_is_noop(spark, tmp_path):
    pairs = chain_plus_cliques()
    cdir = str(tmp_path / "ckpt")
    res1 = connected_components(
        spark, edges_df(spark, pairs), method="hashmin", checkpoint_dir=cdir
    )
    res2 = connected_components(
        spark, edges_df(spark, pairs), method="hashmin", checkpoint_dir=cdir
    )
    assert res2.metrics[-1]["converged"]
    assert sorted(map(tuple, res1.components.collect())) == sorted(
        map(tuple, res2.components.collect())
    )


def test_corrupted_checkpoint_detected(spark, tmp_path):
    cdir = str(tmp_path / "ckpt")
    connected_components(
        spark, edges_df(spark, chain_plus_cliques()), method="hashmin",
        checkpoint_dir=cdir,
    )
    last = ckpt.latest_valid_step(cdir)
    data_dir = os.path.join(cdir, f"step={last}", "data")
    victim = next(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
    with open(os.path.join(data_dir, victim), "ab") as f:
        f.write(b"CORRUPT")
    assert not ckpt.validate_step(cdir, last)
    assert ckpt.latest_valid_step(cdir) in (None, *range(last))


def test_uncommitted_manifest_ignored(spark, tmp_path):
    cdir = str(tmp_path / "ckpt")
    connected_components(
        spark, edges_df(spark, [(1, 2), (2, 3)]), method="hashmin",
        checkpoint_dir=cdir,
    )
    last = ckpt.latest_valid_step(cdir)
    mpath = os.path.join(cdir, f"step={last}", "_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["committed"] = False
    with open(mpath, "w") as f:
        json.dump(m, f)
    assert ckpt.latest_valid_step(cdir) in (None, *range(last))
