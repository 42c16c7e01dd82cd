"""Link-prediction scores over 2-hop candidate pairs — the classic
neighborhood-overlap family (Liben-Nowell & Kleinberg 2003; Adamic & Adar
2003; Zhou/Lü/Zhang 2009 resource allocation): for each non-adjacent pair
(u, v) sharing at least ``min_common`` neighbors,

    cn      = |N(u) ∩ N(v)|
    jaccard = cn / |N(u) ∪ N(v)|
    aa      = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg w)
    ra      = Σ_{w ∈ N(u)∩N(v)} 1 / deg w
    pa      = deg(u) · deg(v)

Distributed shape: one symmetric adjacency pass with degrees precomputed
into it, one wedge self-join on the shared neighbor w (u < v orients each
candidate pair once), a pair-keyed aggregate folding cn/aa/ra in the same
pass (partial aggregation collapses map-side), then one vertex-degree join
per endpoint for jaccard's denominator and pa. The wedge fan-out is
Σ_w deg(w)², so like co-citation (operators/cocitation.py) a ``max_fanout``
hub cap — keep each hub's ``max_fanout`` smallest neighbors, a
deterministic rule the oracle can replay — bounds the blow-up at
C(cap, 2) per hub; ``None`` = exact (gate scale).

AA/RA are float sums whose addition order Spark does not fix, so the gated
query rounds them to 8 decimals (same determinism contract as the
PageRank family). Gate: plain-SQL DuckDB replay, hash-exact
(`linkpred_bipartite`); pytest: networkx `jaccard_coefficient` /
`adamic_adar_index` / `resource_allocation_index` /
`preferential_attachment` parity.

Output: ``(src:long, dst:long, cn:long, jaccard:double, aa:double,
ra:double, pa:long)``, src < dst, non-adjacent pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import canonical_undirected


def link_prediction(
    spark: SparkSession,
    edges: DataFrame,
    *,
    min_common: int = 1,
    max_fanout: int | None = None,
) -> DataFrame:
    """Score non-adjacent 2-hop pairs of the undirected simple graph."""
    if min_common < 1:
        raise ValueError("link_prediction: min_common must be >= 1")
    und = canonical_undirected(edges).persist()
    adj = und.selectExpr("src AS v", "dst AS nbr").unionAll(
        und.selectExpr("dst AS v", "src AS nbr")
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("deg")).persist()
    # adjacency keyed by the wedge hub w, hub degree riding along so the
    # pair aggregate needs no extra join for aa/ra
    hub = adj.selectExpr("nbr AS w", "v").join(
        deg.selectExpr("v AS w", "deg AS wdeg"), "w"
    )
    if max_fanout is not None:
        # deterministic cap: each hub keeps its max_fanout SMALLEST
        # neighbors (replayable in plain SQL; same convention as cocitation)
        from pyspark.sql import Window

        rn = F.row_number().over(
            Window.partitionBy("w").orderBy(F.col("v").asc())
        )
        hub = hub.withColumn("_rn", rn).where(F.col("_rn") <= max_fanout).drop(
            "_rn"
        )
    a = hub.selectExpr("w", "v AS src", "wdeg")
    b = hub.selectExpr("w", "v AS dst")
    pairs = (
        a.join(b, "w")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.count("*").alias("cn"),
            F.sum(F.lit(1.0) / F.log("wdeg")).alias("aa"),
            F.sum(F.lit(1.0) / F.col("wdeg")).alias("ra"),
        )
        .where(F.col("cn") >= min_common)
    )
    # drop existing edges: predictions are for ABSENT links
    cand = pairs.join(und, ["src", "dst"], "left_anti")
    out = (
        cand.join(deg.selectExpr("v AS src", "deg AS sdeg"), "src")
        .join(deg.selectExpr("v AS dst", "deg AS ddeg"), "dst")
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("cn").cast("long").alias("cn"),
            (
                F.col("cn") / (F.col("sdeg") + F.col("ddeg") - F.col("cn"))
            ).alias("jaccard"),
            "aa",
            "ra",
            (F.col("sdeg") * F.col("ddeg")).cast("long").alias("pa"),
        )
    )
    return out
