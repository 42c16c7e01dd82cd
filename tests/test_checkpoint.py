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


def test_blockuf_never_commits_converged_root_labels(spark, tmp_path):
    """ADVICE r1 (high): a crash between the loop's converged write and the
    pass-2 composition must NOT leave a committed converged=True snapshot of
    root-only labels. Invariant checked two ways: (a) every converged=True
    manifest in a finished run holds FULL-vertex labels; (b) with the final
    (composed) step deleted — the crash window — resume reconverges and
    composes correctly."""
    pairs = chain_plus_cliques()
    n_vertices = len({v for p in pairs for v in p})
    cdir = str(tmp_path / "ckpt")
    res = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", checkpoint_dir=cdir,
        num_blocks=4,
    )
    want = sorted(map(tuple, res.components.collect()))
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(cdir) if d.startswith("step=")
    )
    convergeds = [
        s for s in steps
        if (ckpt.read_manifest(cdir, s) or {}).get("metrics", {}).get("converged")
    ]
    assert convergeds, "no converged snapshot written"
    for s in convergeds:
        rows = ckpt.read_checkpoint(spark, cdir, s).count()
        assert rows == n_vertices, (
            f"converged snapshot step={s} has {rows} labels, expected full "
            f"vertex set {n_vertices} (root-only labels committed as final)"
        )
    # (b) crash window: drop the composed step; only mid-run (converged=False)
    # snapshots remain → resume must reconverge + compose, not early-return
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(cdir, crash_dir)
    shutil.rmtree(os.path.join(crash_dir, f"step={max(steps)}"))
    res2 = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", checkpoint_dir=crash_dir,
        num_blocks=4,
    )
    assert sorted(map(tuple, res2.components.collect())) == want


def test_resume_refuses_method_mismatch(spark, tmp_path):
    """ADVICE r1 (medium): a blockuf snapshot resumed under method=hashmin
    (or vice versa) must be ignored, not silently mis-composed."""
    pairs = chain_plus_cliques()
    cdir = str(tmp_path / "ckpt")
    connected_components(
        spark, edges_df(spark, pairs), method="blockuf", checkpoint_dir=cdir,
        num_blocks=4,
    )
    m = ckpt.read_manifest(cdir, ckpt.latest_valid_step(cdir))
    assert m["params"]["method"] == "blockuf"
    assert m["params"]["num_blocks"] == 4
    res = connected_components(
        spark, edges_df(spark, pairs), method="hashmin", checkpoint_dir=cdir
    )
    # fresh hashmin run (mismatch refused) still yields the right components
    ref = connected_components(spark, edges_df(spark, pairs), method="hashmin")
    assert sorted(map(tuple, res.components.collect())) == sorted(
        map(tuple, ref.components.collect())
    )


def test_resume_pins_num_blocks_from_manifest(spark, tmp_path):
    """Mid-run blockuf labels are keyed by block roots that only reproduce
    under the SAME num_blocks — resume must pin it from the manifest even when
    the caller passes a different (or default) value."""
    pairs = chain_plus_cliques()
    cdir = str(tmp_path / "ckpt")
    res_full = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", checkpoint_dir=cdir,
        num_blocks=3,
    )
    want = sorted(map(tuple, res_full.components.collect()))
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(cdir) if d.startswith("step=")
    )
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(cdir, crash_dir)
    shutil.rmtree(os.path.join(crash_dir, f"step={max(steps)}"))
    # caller resumes with num_blocks unset → must pin 3 from the manifest
    res2 = connected_components(
        spark, edges_df(spark, pairs), method="blockuf", checkpoint_dir=crash_dir
    )
    assert sorted(map(tuple, res2.components.collect())) == want


def test_checkpoint_table_format_seam(spark, tmp_path):
    """The sink format is a config swap (Iceberg-ready seam): any DataSource
    name round-trips through the same manifest/lineage machinery."""
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "vertex long, label long"
    )
    cdir = str(tmp_path / "ckpt_json")
    ckpt.write_checkpoint(df, cdir, 0, {"converged": True}, table_format="json")
    m = ckpt.read_manifest(cdir, 0)
    assert m["format"] == "json"
    assert ckpt.validate_step(cdir, 0)
    back = ckpt.read_checkpoint(spark, cdir, 0)
    assert sorted((r["vertex"], r["label"]) for r in back.collect()) == [
        (1, 10), (2, 20), (3, 30),
    ]


def test_resume_refuses_drifted_input_via_root_fingerprint(spark, tmp_path):
    """Mid-run blockuf checkpoints record a root-graph fingerprint; resuming
    against a DIFFERENT edge table must restart from scratch and label the
    new graph correctly (not mis-compose old root labels)."""
    pairs_a = chain_plus_cliques()
    cdir = str(tmp_path / "ckpt")
    connected_components(
        spark, edges_df(spark, pairs_a), method="blockuf", checkpoint_dir=cdir,
        num_blocks=4,
    )
    # leave only mid-run snapshots (drop the converged composed step)
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(cdir) if d.startswith("step=")
    )
    shutil.rmtree(os.path.join(cdir, f"step={max(steps)}"))
    latest = ckpt.latest_valid_step(cdir)
    m = ckpt.read_manifest(cdir, latest)
    assert "root_fp" in m["params"]
    # different input against the same checkpoint dir
    pairs_b = [(i, i + 1) for i in range(500, 700)] + [(42, 43)]
    # pin the manifest's edge_fp to the NEW input's fingerprint so the
    # cheaper input-edge guard passes and the ROOT-GRAPH fingerprint layer
    # is what must catch the drift (defense in depth stays exercised)
    from pyspark.sql import functions as F

    r = edges_df(spark, pairs_b).agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))).alias("s"),
    ).collect()[0]
    mpath = os.path.join(cdir, f"step={latest}", "_manifest.json")
    m["params"]["edge_fp"] = f"{r['n']}:{r['s'] or 0}"
    with open(mpath, "w") as f:
        json.dump(m, f)
    res = connected_components(
        spark, edges_df(spark, pairs_b), method="blockuf", checkpoint_dir=cdir,
        num_blocks=4,
    )
    ref = connected_components(spark, edges_df(spark, pairs_b), method="blockuf")
    assert sorted(map(tuple, res.components.collect())) == sorted(
        map(tuple, ref.components.collect())
    )


def test_converged_snapshot_refuses_drifted_edges(spark, tmp_path):
    """Reusing a checkpoint dir across runs (as jobs/run_link_graph.py does)
    after the edge table CHANGED must recompute, not return the stale
    converged components forever (ADVICE r2 #1) — for both kernels, via the
    input-edge fingerprint recorded in every manifest."""
    pairs_a = chain_plus_cliques()
    pairs_b = [(i, i + 1) for i in range(100, 250)] + [(7, 9), (9, 11)]
    for method in ("hashmin", "blockuf"):
        cdir = str(tmp_path / f"ckpt_{method}")
        connected_components(
            spark, edges_df(spark, pairs_a), method=method, checkpoint_dir=cdir
        )
        assert ckpt.read_manifest(cdir, ckpt.latest_valid_step(cdir))[
            "metrics"
        ]["converged"]
        res = connected_components(
            spark, edges_df(spark, pairs_b), method=method, checkpoint_dir=cdir
        )
        ref = connected_components(spark, edges_df(spark, pairs_b), method=method)
        assert sorted(map(tuple, res.components.collect())) == sorted(
            map(tuple, ref.components.collect())
        ), method
        # the stale steps were cleared: the dir's latest snapshot now belongs
        # to the NEW input, so the next invocation early-returns it
        m = ckpt.read_manifest(cdir, ckpt.latest_valid_step(cdir))
        assert m["metrics"]["converged"]
        res2 = connected_components(
            spark, edges_df(spark, pairs_b), method=method, checkpoint_dir=cdir
        )
        assert res2.num_supersteps == ckpt.latest_valid_step(cdir)
        assert sorted(map(tuple, res2.components.collect())) == sorted(
            map(tuple, ref.components.collect())
        ), method


def test_hashmin_midrun_resume_refuses_drifted_edges(spark, tmp_path):
    """Mid-run hashmin resume against a drifted edge table silently composes
    stale labels (min-labels only decrease — merges from removed edges can
    never be undone); the edge fingerprint must force a fresh start
    (ADVICE r2 #2)."""
    cdir = str(tmp_path / "ckpt")
    connected_components(
        spark, edges_df(spark, chain_plus_cliques()), method="hashmin",
        checkpoint_dir=cdir,
    )
    # drop the converged step so only mid-run snapshots remain
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(cdir) if d.startswith("step=")
    )
    shutil.rmtree(os.path.join(cdir, f"step={max(steps)}"))
    # drifted input: the old chain's merges must not leak in
    pairs_b = [(i, i + 1) for i in range(500, 650)]
    res = connected_components(
        spark, edges_df(spark, pairs_b), method="hashmin", checkpoint_dir=cdir
    )
    ref = connected_components(spark, edges_df(spark, pairs_b), method="hashmin")
    assert sorted(map(tuple, res.components.collect())) == sorted(
        map(tuple, ref.components.collect())
    )


def test_lineage_files_walks_nested_layouts(tmp_path):
    """Formats that write subdirectories (Iceberg-style data/ trees) must
    hash every nested data file and skip bookkeeping at every level
    (ADVICE r2 #4)."""
    d = tmp_path / "data"
    (d / "sub" / "deeper").mkdir(parents=True)
    (d / "a.parquet").write_bytes(b"aaa")
    (d / "sub" / "b.parquet").write_bytes(b"bbb")
    (d / "sub" / "deeper" / "c.orc").write_bytes(b"ccc")
    (d / "_SUCCESS").write_bytes(b"")
    (d / "sub" / ".b.parquet.crc").write_bytes(b"x")
    files = ckpt._lineage_files(str(d))
    names = [e["file"] for e in files]
    assert names == sorted(
        ["a.parquet", os.path.join("sub", "b.parquet"),
         os.path.join("sub", "deeper", "c.orc")]
    )
    assert all(e["md5"] and e["bytes"] == 3 for e in files)
