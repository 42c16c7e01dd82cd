"""Cluster-launch entry point for the link-graph pipeline (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

    python scripts/make_pyfiles.py
    spark-submit --master local[8] \\
        --py-files dist/cc3d_spark.zip \\
        jobs/run_link_graph.py \\
        --pages 20000 --out /tmp/lg_out --checkpoint /tmp/lg_ckpt

On a real cluster only --master changes (yarn/k8s); the script imports the
engine exclusively from the shipped zip. Runs: synthetic (or parquet) pages
→ vectorized extraction → edge hygiene → CC (checkpointed + resumable) →
PageRank → per-component stats; writes parquet outputs and prints a one-line
JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000, help="synthetic page count")
    ap.add_argument("--pages-parquet", default=None, help="read pages from parquet instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--pr-iters", type=int, default=5)
    ap.add_argument("--cc-method", default="blockuf", choices=["blockuf", "hashmin"])
    ap.add_argument("--num-blocks", type=int, default=None,
                    help="blockuf contraction blocks (resume pins from manifest)")
    ap.add_argument("--checkpoint-format", default="parquet",
                    help="checkpoint sink DataSource (e.g. iceberg with jars)")
    ap.add_argument("--salting", default="auto", choices=["auto", "on", "off"],
                    help="hot-key salted aggregation in CC/PageRank")
    args = ap.parse_args()
    salting = {"auto": "auto", "on": True, "off": False}[args.salting]

    # engine imports AFTER SparkSession exists: on a cluster the zip is
    # distributed to executors by --py-files and to the driver's sys.path
    spark = SparkSession.builder.appName("link-graph").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from connected_components_3d_spark.operators.cc import (
        connected_components,
        num_components,
    )
    from connected_components_3d_spark.operators.edges import degrees, href_edges
    from connected_components_3d_spark.operators.pagerank import pagerank
    from connected_components_3d_spark.operators.stats import component_sizes
    from connected_components_3d_spark.sources.pages import synthetic_pages

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    else:
        pages = synthetic_pages(spark, args.pages, num_partitions=64)

    edges = href_edges(pages).localCheckpoint(eager=True)
    n_edges = edges.count()

    cc = connected_components(
        spark,
        edges,
        method=args.cc_method,
        checkpoint_dir=os.path.join(args.checkpoint, "cc"),
        checkpoint_format=args.checkpoint_format,
        num_blocks=args.num_blocks,
        salting=salting,
    )
    comps = cc.components
    comps.write.mode("overwrite").parquet(os.path.join(args.out, "components"))

    pr = pagerank(spark, edges, fixed_iters=args.pr_iters, salting=salting)
    pr.ranks.write.mode("overwrite").parquet(os.path.join(args.out, "pagerank"))

    deg = degrees(edges)
    sizes = component_sizes(comps)
    top = [r.asDict() for r in sizes.orderBy(F.desc("size")).limit(5).collect()]

    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "n_components": num_components(comps),
                "cc_supersteps": cc.num_supersteps,
                "pr_iters": pr.num_iters,
                "max_deg": deg.agg(F.max("deg")).collect()[0][0],
                "top_components": top,
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
