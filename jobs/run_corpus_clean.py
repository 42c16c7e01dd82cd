"""Cluster-launch entry point for the corpus-cleaning pipeline — the
training-data half of the engine composed end to end, the way a webtext
deployment actually chains it:

    python scripts/make_pyfiles.py
    spark-submit --master local[8] \\
        --py-files dist/cc3d_spark.zip \\
        jobs/run_corpus_clean.py \\
        --docs-parquet /root/testdata/sf0.001/documents.parquet \\
        --out /tmp/clean_out

Stages (each writes its survivor count into the JSON summary, so the
funnel is auditable):

  1. exact dedup           md5 whole-text, keep min doc_id per fingerprint
  2. paragraph dedup       corpus-wide repeated paragraphs dropped (O80)
  3. duplicated-span scrub cross-doc 5-gram span removal (O50c)
  4. quality filters       Gopher-style repetition + heuristic quality
                           score floor (functions/text.py)
  5. split                 deterministic train/val split by md5 hex range
                           (O69) — written as separate parquet dirs

On a real cluster only --master changes; the engine imports exclusively
from the shipped zip (same contract as jobs/run_link_graph.py).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-parquet", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ngram", type=int, default=5)
    ap.add_argument("--quality-floor", type=float, default=0.2)
    ap.add_argument("--val-frac", default="1/16",
                    help="validation split as a num/den rational")
    args = ap.parse_args()
    num, den = (int(x) for x in args.val_frac.split("/"))

    spark = SparkSession.builder.appName("corpus-clean").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from connected_components_3d_spark.functions.text import quality_score
    from connected_components_3d_spark.operators.ngramdedup import (
        remove_duplicated_ngrams,
    )
    from connected_components_3d_spark.operators.paradedup import (
        paragraph_dedup,
    )
    from connected_components_3d_spark.operators.split import split_by_hash

    docs = spark.read.parquet(args.docs_parquet).select(
        F.col("doc_id").cast("long"), "text"
    )
    funnel = {"input": docs.count()}

    # 1. exact dedup (min doc_id per fingerprint survives)
    fp = docs.withColumn("fp", F.md5("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    d1 = fp.join(keep, ["fp", "doc_id"], "left_semi").drop("fp")
    funnel["after_exact_dedup"] = d1.count()

    # 2. corpus paragraph dedup
    d2 = paragraph_dedup(d1).docs.select(
        "doc_id", F.col("text_clean").alias("text")
    ).where(F.length("text") > 0)
    funnel["after_paragraph_dedup"] = d2.count()

    # 3. duplicated-span scrub
    d3 = remove_duplicated_ngrams(d2, n=args.ngram).select(
        "doc_id", F.col("text_clean").alias("text")
    ).where(F.length("text") > 0)
    funnel["after_span_scrub"] = d3.count()

    # 4. quality floor
    d4 = d3.where(quality_score("text") >= args.quality_floor)
    funnel["after_quality"] = d4.count()

    # 5. deterministic split
    sp = split_by_hash(
        d4, "doc_id", {"val": num / den, "train": (den - num) / den}
    )
    for name in ("train", "val"):
        part = sp.where(F.col("split") == name).drop("split")
        part.write.mode("overwrite").parquet(f"{args.out}/{name}")
        funnel[f"out_{name}"] = part.count()

    print(json.dumps({"funnel": funnel, "out": args.out}))


if __name__ == "__main__":
    main()
