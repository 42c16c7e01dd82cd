"""End-to-end job scripts (jobs/): run the corpus-cleaning pipeline as a
subprocess against the sf0.001 documents table and check the funnel
invariants (monotone survivor counts, disjoint exhaustive split outputs,
boilerplate actually removed)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_corpus_clean(tmp_path):
    env = dict(os.environ)
    # spark-submit --py-files ships the zip in production; plain python
    # needs the repo on PYTHONPATH instead (same contract as
    # jobs/run_link_graph.py)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_corpus_clean.py"),
            "--docs-parquet",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            str(tmp_path / "out"),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    funnel = json.loads(line)["funnel"]
    # monotone, nonempty funnel
    assert (
        funnel["input"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_paragraph_dedup"]
        >= funnel["after_span_scrub"]
        >= funnel["after_quality"]
        > 0
    )
    # split outputs partition the quality survivors
    assert funnel["out_train"] + funnel["out_val"] == funnel["after_quality"]
    assert funnel["out_train"] > 0
