"""Mechanical bench-regression gate (VERDICT r1 #10).

Compares a bench.py JSON line against the checked-in BENCH_SNAPSHOT.json and
exits non-zero when a steady-state median regressed beyond the tolerance —
so a round-over-round kernel regression is caught by a command, not by a
human reading BENCH.md.

Only the per-superstep / per-iteration MEDIANS are gated: one-shot total
walls on a shared VM swing ±15% with no code change (BENCH.md §2), medians
are the stable signal. The snapshot records the config it was measured
under (synthetic edge count, cpus); a run under any other config is
ignored rather than mis-compared.

Usage:
  python scripts/bench_check.py --from out.json     # check an existing line
  python scripts/bench_check.py                     # run kernels-only bench, then check
  python scripts/bench_check.py --update out.json   # re-pin the snapshot
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "BENCH_SNAPSHOT.json")

# lower-is-better steady-state medians (north block)
GATED = ["cc_median_superstep_s", "pr_median_iter_s"]
# higher-is-better rates (north block) — e.g. the dense grid kernel's
# voxels/sec (VERDICT r2 #7): fails when the rate drops below pinned/tol
GATED_RATES = ["grid_voxels_per_sec"]
# lower-is-better one-shot query walls (queries block); the round-3/4
# operator rows exist only in FULL bench output (kernels-only runs skip
# them — check() skips keys absent from the run)
GATED_TOTALS = [
    "cc_synth_blockuf",
    "grid_cc_4m_voxels",
    "ppr_bipartite",
    "scc_parts",
    "kcore_bipartite",
    "core_numbers_ring",
    "neighborhood_hyperball_r2",
    "harmonic_hyperball_r3",
    "hits_bipartite",
    "host_pagerank_orders",
    "clustering_copart",
    "cocitation_parts",
    "mis_copart",
    "msf_tree_ring",
    "densest_mixed",
    "butterflies_bipartite",
    "ssjoin_documents",
    "katz_bipartite",
    "spreading_tree",
    "cooccurrence_events",
    "funnel_events",
    "temporal_reach_events",
    "bridges_tree_ring",
    "biconnected_mix",
    "louvain_cliques",
    "sweepcut_ppr_bipartite",
    "batch_ppr_bipartite",
    "heavy_tokens_docs",
    "linkage_tree_ring",
    "node2vec_tree",
    "partition_cliques",
    "hitting_time_tree",
    "dust_rules_docs",
    "bpe_merges_docs",
    "robustness_tree_ring",
    "logreg_docs",
    "hopping_events",
]


def load_bench(path: str | None) -> dict:
    if path:
        with open(path) as f:
            text = f.read()
    else:
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_KERNELS_ONLY"] = "1"
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        text = out.stdout
    line = [l for l in text.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    args = sys.argv[1:]
    src = None
    update = False
    if "--from" in args:
        src = args[args.index("--from") + 1]
    if "--update" in args:
        src = args[args.index("--update") + 1]
        update = True
    bench = load_bench(src)
    cfg = {
        "n_synth_edges": bench["north"]["n_synth_edges"],
        "cpus": bench.get("cpus", "32"),
    }
    if update:
        snap = {
            "config": cfg,
            "medians": {k: bench["north"][k] for k in GATED},
            "rates": {k: bench["north"][k] for k in GATED_RATES},
            "totals": {
                k: bench["queries"][k]
                for k in GATED_TOTALS
                if k in bench["queries"]
            },
            "max_regression": 1.4,
        }
        with open(SNAPSHOT, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
        print(f"pinned {SNAPSHOT}: {snap['medians']} {snap['rates']} {snap['totals']}")
        return 0

    if not os.path.exists(SNAPSHOT):
        print("no BENCH_SNAPSHOT.json — run with --update first")
        return 1
    with open(SNAPSHOT) as f:
        snap = json.load(f)
    if snap["config"] != cfg:
        print(f"config mismatch (snapshot {snap['config']} vs run {cfg}) — skipped")
        return 0
    tol = snap.get("max_regression", 1.4)
    failed = 0

    def check(kind, keys, pinned, source, higher_better=False):
        nonlocal failed
        for k in keys:
            if k not in pinned:
                continue  # snapshot predates this gate row
            if k not in source:
                continue  # kernels-only run: full-bench rows absent
            want, got = pinned[k], source[k]
            ok = got >= want / tol if higher_better else got <= want * tol
            if not ok:
                failed += 1
            unit = "/s" if higher_better else "s"
            print(
                f"{'ok' if ok else 'REGRESSED':>9}  {k}: "
                f"{got:.3f}{unit} vs pinned {want:.3f}{unit} (tol {tol}x)"
            )

    check("median", GATED, snap.get("medians", {}), bench["north"])
    check("rate", GATED_RATES, snap.get("rates", {}), bench["north"],
          higher_better=True)
    check("total", GATED_TOTALS, snap.get("totals", {}), bench["queries"])
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
