"""Physical-plan audits (SURVEY.md §4.2, driver 'optimize for scale' rules):
the plans the engine emits must show predicate pushdown, column pruning,
broadcast joins for small dims, and TakeOrderedAndProject top-k — asserted
on the explain output, not assumed."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from connected_components_3d_spark import driver_queries as dq
from connected_components_3d_spark.plans import (
    broadcast_join_count,
    exchange_count,
    explain_str,
    pushed_filters,
    read_schemas,
)
from connected_components_3d_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = dq.q_pricing_summary(spark, SF)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf


def test_column_pruning_on_projection(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    schemas = read_schemas(li)
    assert schemas, "no ReadSchema found"
    # 2-column projection must not read all 11 lineitem columns
    assert all(
        "l_extendedprice" not in s and "l_shipdate" not in s for s in schemas
    ), schemas


def test_pushdown_on_point_filter(spark):
    docs = load_table(spark, SF, "documents").where(F.col("doc_id") == 7)
    pf = pushed_filters(docs)
    assert any("EqualTo(doc_id,7)" in f for f in pf), pf


def test_supplier_revenue_broadcasts_small_dim(spark):
    df = dq.q_supplier_revenue(spark, SF)
    assert broadcast_join_count(df) >= 1, explain_str(df)


def test_largest_k_uses_take_ordered(spark):
    """top-k compiles to TakeOrderedAndProject (per-partition top-k + driver
    merge), not a global sort."""
    li = load_table(spark, SF, "lineitem")
    top = li.orderBy(F.desc("l_extendedprice")).limit(5)
    assert "TakeOrderedAndProject" in explain_str(top)


def test_degrees_exchange_budget(spark):
    """Degree computation is two partial+final hash aggs and one full-outer
    merge — the shuffle budget must stay bounded (no accidental extra
    repartitions)."""
    df = dq.q_degrees_bipartite(spark, SF)
    assert exchange_count(df) <= 4, explain_str(df)


def test_tree_cc_label_filter_is_broadcast(spark):
    """Multilabel edge filter broadcasts the (small) label side twice."""
    from connected_components_3d_spark.operators.edges import filter_edges_by_label

    edges = dq.tree_edges(spark, SF)
    labels = edges.select(F.col("src").alias("vertex")).distinct().select(
        "vertex", (F.col("vertex") % 3).alias("label")
    )
    out = filter_edges_by_label(edges, labels)
    assert broadcast_join_count(out) >= 2, explain_str(out)


@pytest.mark.parametrize("mode", ["formatted", "simple"])
def test_explain_capture_roundtrip(spark, mode):
    df = load_table(spark, SF, "region")
    text = explain_str(df, mode)
    assert "Scan parquet" in text or "FileScan" in text


def test_bucketed_edge_table_skips_exchange(spark):
    """O14 persisted co-location: a bucketed+sorted edge table feeds both a
    bucket-key aggregation and a self-join with ZERO shuffle exchanges —
    the layout does the distribution once, at write time."""
    import pyspark.sql.functions as F

    from connected_components_3d_spark.plans.audit import exchange_count
    from connected_components_3d_spark.sources.tables import save_bucketed

    edges = spark.range(0, 10_000).select(
        F.pmod(F.xxhash64("id"), F.lit(500)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(500)).alias("dst"),
    )
    save_bucketed(edges, "e_bucketed_test", num_buckets=4, key="src")
    try:
        t = spark.table("e_bucketed_test")
        agg = t.groupBy("src").agg(F.count("*").alias("deg"))
        assert exchange_count(agg) == 0, "bucketed groupBy must not exchange"
        joined = t.alias("a").join(
            spark.table("e_bucketed_test").alias("b"), "src"
        )
        assert exchange_count(joined) == 0, "bucketed self-join must not exchange"
        # and the result is still correct
        assert agg.agg(F.sum("deg")).collect()[0][0] == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed_test")


def test_bucketed_input_feeds_cc_and_pagerank_without_edge_exchange(spark):
    """VERDICT r2 #5: the kernels EXPLOIT the persisted bucketed layout, not
    just demonstrate it. CC's block contraction with block_key="input" runs
    directly on the bucket partitions (zero exchanges in the star plan) and
    labels match the default kernel exactly; PageRank with pre_partitioned +
    assume_distinct skips the one-time repartition and agrees with the
    default path to float-sum reassociation tolerance."""
    from connected_components_3d_spark.operators.cc import (
        block_contract,
        connected_components,
    )
    from connected_components_3d_spark.operators.pagerank import pagerank
    from connected_components_3d_spark.plans.audit import exchange_count
    from connected_components_3d_spark.sources.tables import save_bucketed

    edges = spark.range(0, 20_000).select(
        F.pmod(F.xxhash64("id"), F.lit(800)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(800)).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    save_bucketed(edges, "e_kernel_bucketed_test", num_buckets=4, key="src")
    try:
        t = spark.table("e_kernel_bucketed_test")
        stars = block_contract(t, 4, "input")
        assert exchange_count(stars) == 0, "input-block contraction must not exchange"

        got = connected_components(spark, t, method="blockuf", block_key="input")
        ref = connected_components(spark, edges, method="blockuf")
        assert sorted(map(tuple, got.components.collect())) == sorted(
            map(tuple, ref.components.collect())
        )

        pr_b = pagerank(spark, t, fixed_iters=5, pre_partitioned=True,
                        assume_distinct=True)
        pr_r = pagerank(spark, edges, fixed_iters=5)
        b = {r["vertex"]: r["rank"] for r in pr_b.ranks.collect()}
        r = {r["vertex"]: r["rank"] for r in pr_r.ranks.collect()}
        assert set(b) == set(r)
        assert all(abs(b[v] - r[v]) <= 1e-9 * max(1.0, abs(r[v])) for v in b)
    finally:
        spark.sql("DROP TABLE IF EXISTS e_kernel_bucketed_test")


def test_split_and_mix_are_map_only(spark):
    """The corpus split and mix operators claim MAP-ONLY execution —
    their physical plans must contain ZERO exchanges: the hash-range
    decision and the copy-materializing explode are per-row."""
    from connected_components_3d_spark.operators.mix import mix_corpus
    from connected_components_3d_spark.operators.split import split_by_hash

    docs = load_table(spark, SF, "documents")
    sp = split_by_hash(
        docs.select("doc_id"), "doc_id", {"train": 0.8, "val": 0.2}
    )
    assert exchange_count(sp) == 0, explain_str(sp)
    mx = mix_corpus(
        docs.select("doc_id", "lang"), "doc_id", "lang", {"en": 2.25}
    )
    assert exchange_count(mx) == 0, explain_str(mx)


def test_frontier_shard_is_map_side(spark):
    """Frontier sharding adds exactly the per-host window's exchange on
    top of the scan — host extraction and shard bucketing are row-local
    (one exchange for the rank window, nothing else)."""
    from connected_components_3d_spark.operators.frontier import (
        politeness_schedule,
    )

    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id", "'https://h' || (doc_id % 5) || '.com/' || doc_id AS url",
        "n_chars AS prio",
    )
    out = politeness_schedule(
        docs, priority_col="prio", per_host_rate=2, num_shards=4
    )
    assert exchange_count(out) <= 1, explain_str(out)


# --- round-4 continuation operators: plan-shape audits ---------------------


def test_rmat_generation_is_exchange_free(spark):
    """The R-MAT source must be a pure map over spark.range — zero
    exchanges, zero joins: generation parallelism is free at any scale."""
    from connected_components_3d_spark.sources.rmat import rmat_edges

    df = rmat_edges(spark, 10, 10_000)
    assert exchange_count(df) == 0, explain_str(df)
    assert "Join" not in explain_str(df)


def test_dust_rules_exchange_budget(spark):
    """DUST mining: two aggregate exchanges (group stage + host rollup),
    no join exchanges — the operator is explode + two groupBys."""
    from connected_components_3d_spark.operators.dust import param_dust_rules

    docs = load_table(spark, SF, "documents").select(
        F.expr("'https://h' || CAST(doc_id % 5 AS STRING)"
               " || '.example.com/p?x=' || CAST(doc_id AS STRING)").alias("url"),
        "text",
    )
    df = param_dust_rules(docs).rules
    assert exchange_count(df) <= 2, explain_str(df)
    assert "Join" not in explain_str(df)


def test_path_rollup_single_aggregate_exchange(spark):
    from connected_components_3d_spark.operators.pathtree import (
        path_prefix_rollup,
    )

    docs = load_table(spark, SF, "documents").select(
        F.expr("'https://h.example.com/a/' || CAST(doc_id AS STRING)").alias(
            "url"
        ),
        "text",
    )
    df = path_prefix_rollup(docs).rollup
    # one partial+final agg pair → at most one exchange (AQE may report 0
    # before the shuffle materializes)
    assert exchange_count(df) <= 1, explain_str(df)
    assert "Join" not in explain_str(df)


def test_hopping_window_single_aggregate_exchange(spark):
    from connected_components_3d_spark.operators.windows import (
        hopping_window_counts,
    )

    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df = hopping_window_counts(ev)
    # countDistinct expands to a two-phase distinct aggregate: ≤ 2 exchanges
    assert exchange_count(df) <= 2, explain_str(df)
    assert "Join" not in explain_str(df)


def test_logreg_scoring_is_map_only(spark):
    from connected_components_3d_spark.operators.logreg import predict_proba

    docs = load_table(spark, SF, "documents").select(
        (F.col("n_chars") / 1000.0).alias("x0")
    )
    df = predict_proba(docs, ["x0"], [1.5], -0.5)
    assert exchange_count(df) == 0, explain_str(df)


def test_kcore_peel_round_is_broadcast_anti(spark):
    """Round-5 k-core peel: when the dropped set fits a broadcast, the
    per-round edge filter is two broadcast ANTI-joins (map-only, no
    exchange of the edge table) — the plan the peel loop builds internally,
    audited here on the same construction."""
    from pyspark.sql import functions as F2

    e = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], "src long, dst long"
    ).repartition(4, "src").persist()
    e.count()
    drop = spark.createDataFrame([(3,), (11,)], "vertex long")
    drop = drop.localCheckpoint(eager=True)
    nxt = (
        e.join(
            F2.broadcast(drop.withColumnRenamed("vertex", "src")),
            "src",
            "left_anti",
        )
        .join(
            F2.broadcast(drop.withColumnRenamed("vertex", "dst")),
            "dst",
            "left_anti",
        )
        .select("src", "dst")
    )
    plan = explain_str(nxt)
    # AQE explain prints initial+final plans — require both anti-joins
    # present (>=2), and no sort-merge/shuffled-hash join anywhere
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "LeftAnti" in plan, plan
    # no shuffle of the edge side: the only exchanges are the two broadcasts
    assert exchange_count(nxt) == 0, plan
    e.unpersist()
