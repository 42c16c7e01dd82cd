"""Diagnostic: run ONLY the CC hash-min north kernel and print EVERY
superstep's metrics (wall, changed, eps). Used to tell host-noise stalls
(bimodal walls) from genuine plan regressions (uniformly slow steps) when a
scaling pair reports an anomalous median.

Usage:
  SPARK_GRAFT_MASTER='local-cluster[8,4,8192]' SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=32 SPARK_GRAFT_DRIVER_MEM=8g \
  python scripts/probe_cc_supersteps.py --edges 160000000
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
    n_edges = 160_000_000
    if "--edges" in sys.argv:
        n_edges = int(sys.argv[sys.argv.index("--edges") + 1])
    extra = None
    if "--eventlog" in sys.argv:
        d = sys.argv[sys.argv.index("--eventlog") + 1]
        os.makedirs(d, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": f"file://{d}"}
    spark = get_spark("probe-cc", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    n_v = max(n_edges // 4, 1000)
    # identical generator to bench.py's north kernel graph
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
    t0 = time.time()
    res = connected_components(spark, synth, method="hashmin")
    wall = round(time.time() - t0, 3)
    for m in res.metrics:
        print(json.dumps(m), flush=True)
    walls = sorted(m["wall_s"] for m in res.metrics)
    med = walls[len(walls) // 2]
    print(
        json.dumps(
            {
                "n_synth_edges": n_synth,
                "total_wall_s": wall,
                "median_superstep_s": med,
                "cc_eps": round(2 * n_synth / med, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
