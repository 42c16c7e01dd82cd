"""Co-citation and bibliographic-coupling similarity — the classic
"related pages" signals (Dean & Henzinger, WWW 1999; Small 1973):

  co-citation(a, b)             = |{s : s→a and s→b}|   (cited together)
  bibliographic coupling(a, b)  = |{d : a→d and b→d}|   (cite the same)

Relational shape: one self-join of the edge table on the shared endpoint +
one groupBy over the generated pairs. The scale hazard is the hub fan-out —
a source with out-degree D emits C(D, 2) pairs, so a 10^6-out-degree
directory page alone would emit 5·10^11 rows. ``max_fanout`` (default 256)
drops generator vertices above that degree BEFORE the self-join — the
standard practice for link-based similarity at web scale (a page linking to
everything carries no similarity signal; same hub-capping rationale as the
reference-side capped adjacency, operators/stats.py). The cap bounds the
pair blow-up at C(cap, 2) per generator and the groupBy keys are the pair
ids themselves (high-cardinality, skew-free by construction); partial
aggregation shrinks the shuffle to distinct surviving pairs.

``jaccard`` normalizes by the CAPPED-graph neighbor sets (|N∩| /
|N_a ∪ N_b| over generators that survived the cap) so counts and
normalization stay mutually consistent; rounded to 8 places for the
driver-gate hash (row ``cocitation_parts``).

Output: (a:long, b:long, common:long, jaccard:double), a < b,
common ≥ ``min_count``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cocitation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    min_count: int = 1,
    max_fanout: int = 256,
) -> DataFrame:
    """Co-citation pairs over the DIRECTED simple graph (duplicate edges
    and self-loops dropped). Pairs of DESTINATIONS sharing ≥ ``min_count``
    common sources; sources with out-degree > ``max_fanout`` are excluded
    from pair generation (hub cap, see module docstring)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    gen = (
        e.groupBy("src")
        .agg(F.count("*").alias("_fan"))
        .where(F.col("_fan") <= max_fanout)
        .select("src")
    )
    ec = e.join(gen, "src", "left_semi")
    pairs = (
        ec.alias("l")
        .join(ec.alias("r"), F.col("l.src") == F.col("r.src"))
        .where(F.col("l.dst") < F.col("r.dst"))
        .groupBy(
            F.col("l.dst").alias("a"), F.col("r.dst").alias("b")
        )
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= min_count)
    )
    # in-degree on the capped graph: |N(a) ∪ N(b)| = da + db − common
    ind = ec.groupBy(F.col("dst").alias("v")).agg(
        F.count("*").alias("ind")
    )
    return (
        pairs.join(ind.withColumnRenamed("v", "a"), "a")
        .withColumnRenamed("ind", "ind_a")
        .join(ind.withColumnRenamed("v", "b"), "b")
        .withColumnRenamed("ind", "ind_b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("ind_a") + F.col("ind_b") - F.col("common")),
                8,
            ).alias("jaccard"),
        )
    )


def bibliographic_coupling(
    spark: SparkSession,
    edges: DataFrame,
    *,
    min_count: int = 1,
    max_fanout: int = 256,
) -> DataFrame:
    """Bibliographic coupling = co-citation on the TRANSPOSED graph: pairs
    of SOURCES sharing common destinations; destinations with in-degree >
    ``max_fanout`` are excluded from pair generation."""
    return cocitation(
        spark,
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        min_count=min_count,
        max_fanout=max_fanout,
    )
