"""Ad-hoc A/B: CC hash-min with the half-scan neighbor-min path ON
(default gate) vs OFF (half_scan_max_frontier=0), interleaved A/B/A/B on the
same persisted 40M-edge synthetic graph to dodge the host's bimodal-speed
noise (BENCH.md §1). Reports per-run median superstep wall + which supersteps
took the half path (changed <= gate), so the effect is read off the
supersteps where the path actually differs.

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_half_scan_ab.py [--edges N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from connected_components_3d_spark.operators.cc import connected_components  # noqa: E402
from connected_components_3d_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_edges = 40_000_000
    if "--edges" in sys.argv:
        n_edges = int(sys.argv[sys.argv.index("--edges") + 1])
    spark = get_spark("probe-half-scan-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n_v = max(n_edges // 4, 1000)
    synth = (
        spark.range(0, n_edges, 1, 64)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_v)).alias("src"),
            F.pmod(
                F.xxhash64(F.col("id"), F.lit(2)),
                F.when(F.pmod("id", F.lit(10)) < 7, F.lit(n_v // 20)).otherwise(
                    F.lit(n_v)
                ),
            ).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    n_synth = synth.count()
    print(json.dumps({"n_synth_edges": n_synth}), flush=True)
    for rep in range(2):
        for mode, gate in (("half_on", 4_000_000), ("half_off", 0)):
            t0 = time.time()
            res = connected_components(
                spark, synth, method="hashmin", half_scan_max_frontier=gate
            )
            wall = round(time.time() - t0, 3)
            walls = sorted(m["wall_s"] for m in res.metrics)
            med = walls[len(walls) // 2]
            # supersteps whose *previous* changed-count was under the gate:
            # those are the ones the half path can affect
            late = [
                m["wall_s"]
                for i, m in enumerate(res.metrics)
                if i > 0 and res.metrics[i - 1]["labels_changed"] <= 4_000_000
            ]
            print(
                json.dumps(
                    {
                        "rep": rep,
                        "mode": mode,
                        "total_wall_s": wall,
                        "median_superstep_s": med,
                        "cc_eps": round(2 * n_synth / med, 1),
                        "late_step_walls": [round(w, 3) for w in late],
                        "late_sum_s": round(sum(late), 3),
                        "steps": len(res.metrics),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
