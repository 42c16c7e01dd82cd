"""Redirect-chain resolution — canonicalizing a web corpus's HTTP-redirect
/ alias / symlink graph: every source url carries at most ONE redirect
edge, so the edge table is a FUNCTIONAL graph (a ρ-forest: trees hanging
off terminals or cycles), and the ask is "where does each url finally
land, in how many hops, and which chains are redirect loops".

This is the classic pointer-doubling / list-ranking kernel (Wyllie 1979;
the parallel-prefix view of path contraction) — NOT the CC kernel: hop
counts must stay exact, so each round composes the current mapping with
itself (f ← f∘f, hops additive), reaching any terminal within
⌈log₂ n⌉ + 1 rounds. Cycles never settle; after the doubling phase every
unsettled pointer has provably landed ON its cycle (2^K ≥ any tail
length), so a second min-doubling pass over the cycle subgraph alone
labels each cycle by its minimum vertex.

Semantics (fixed, deterministic — replayed by the single-node pytest
oracle and the DuckDB recursive-CTE walk in the `redirects_mix` gate row):

  duplicate (src,dst) rows collapse; two DIFFERENT targets for one src
  raise (a redirect map must be functional);
  output one row per redirect SOURCE:
    status='ok'           final = chain terminal, hops = exact edge count
    status='on_cycle'     src itself sits on a redirect loop
    status='enters_cycle' src's chain falls into a loop downstream
  loop rows report final = MIN vertex id of the loop (the canonical cycle
  representative) and hops = -1 (no finite chain length exists).

Scale shape: state is one row per source (v, ptr, hops, settled); each
round is a single self-join keyed on ptr (sort-merge against the same
vertex-keyed layout) plus a scalar settled-count action — O(log n) rounds
total, shuffle volume per round is source-sized, never edge-walk-sized
(a sequential crawl of a 10^8-long redirect chain is the thing this
kernel exists to avoid). Per-round persist + count truncates lineage
(the cc.py superstep discipline).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RedirectResult:
    resolved: DataFrame  # (src: long, final: long, hops: long, status: string)
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def resolve_redirects(spark: SparkSession, edges: DataFrame) -> RedirectResult:
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    conflicts = (
        e.groupBy("src").count().filter(F.col("count") > 1).limit(1).count()
    )
    if conflicts:
        raise ValueError(
            "resolve_redirects: a src has two different targets — the "
            "redirect map must be functional"
        )
    e = _truncate(e)
    n = e.count()
    empty = e.select(
        F.col("src"),
        F.col("dst").alias("final"),
        F.lit(0).cast("long").alias("hops"),
        F.lit("ok").alias("status"),
    ).limit(0)
    if n == 0:
        return RedirectResult(empty, 0)

    srcs = e.select(F.col("src").alias("p")).distinct()
    # ptr not itself a source ⇒ already at the terminal
    state = _truncate(
        e.join(srcs, e.dst == srcs.p, "left").select(
            F.col("src").alias("v"),
            F.col("dst").alias("ptr"),
            F.lit(1).cast("long").alias("hops"),
            F.col("p").isNull().alias("settled"),
        )
    )
    rounds = 0
    metrics: list[dict] = []
    max_rounds = max(1, math.ceil(math.log2(n)) + 1)
    for _ in range(max_rounds):
        t0 = time.time()
        open_cnt = state.filter(~F.col("settled")).count()
        if open_cnt == 0:
            break
        m = state.select(
            F.col("v").alias("p2"),
            F.col("ptr").alias("ptr2"),
            F.col("hops").alias("hops2"),
            F.col("settled").alias("settled2"),
        )
        hop = ~F.col("settled") & F.col("p2").isNotNull()
        state = _truncate(
            state.join(m, state.ptr == m.p2, "left").select(
                "v",
                F.when(hop, F.col("ptr2")).otherwise(F.col("ptr")).alias("ptr"),
                F.when(hop, F.col("hops") + F.col("hops2"))
                .otherwise(F.col("hops"))
                .alias("hops"),
                # p2 null = ptr is terminal (can't happen unsettled after
                # init, kept for clarity); otherwise inherit ptr's verdict
                (F.col("settled") | F.col("p2").isNull() | F.col("settled2"))
                .alias("settled"),
            )
        )
        rounds += 1
        metrics.append(
            {"round": rounds, "open": int(open_cnt), "sec": time.time() - t0}
        )

    ok = state.filter("settled").select(
        F.col("v").alias("src"),
        F.col("ptr").alias("final"),
        "hops",
        F.lit("ok").alias("status"),
    )
    looped = state.filter(~F.col("settled"))
    if looped.limit(1).count() == 0:
        return RedirectResult(_truncate(ok), rounds, metrics)

    # phase 2: every unsettled ptr is ON its cycle; min-doubling over the
    # cycle subgraph labels each loop by its minimum vertex
    cyc_pts = looped.select(F.col("ptr").alias("cv")).distinct()
    ce = e.join(cyc_pts, e.src == cyc_pts.cv).select("src", "dst")
    cstate = _truncate(
        ce.select(
            F.col("src").alias("v"),
            F.col("dst").alias("ptr"),
            F.least("src", "dst").alias("rep"),
        )
    )
    n_cyc = cstate.count()
    for _ in range(max(1, math.ceil(math.log2(max(n_cyc, 2))) + 1)):
        m = cstate.select(
            F.col("v").alias("p2"),
            F.col("ptr").alias("ptr2"),
            F.col("rep").alias("rep2"),
        )
        cstate = _truncate(
            cstate.join(m, cstate.ptr == m.p2).select(
                "v",
                F.col("ptr2").alias("ptr"),
                F.least("rep", "rep2").alias("rep"),
            )
        )
        rounds += 1
    reps = cstate.select(F.col("v").alias("cv"), "rep")
    loop_rows = (
        looped.join(reps, looped.ptr == reps.cv)
        .join(
            cyc_pts.select(F.col("cv").alias("self_cv")),
            looped.v == F.col("self_cv"),
            "left",
        )
        .select(
            F.col("v").alias("src"),
            F.col("rep").alias("final"),
            F.lit(-1).cast("long").alias("hops"),
            F.when(F.col("self_cv").isNotNull(), F.lit("on_cycle"))
            .otherwise(F.lit("enters_cycle"))
            .alias("status"),
        )
    )
    return RedirectResult(
        _truncate(ok.unionByName(loop_rows)), rounds, metrics
    )


def resolve_single_node(
    edge_list: list[tuple[int, int]]
) -> dict[int, tuple[int, int, str]]:
    """Sequential walk with cycle detection — the pytest oracle.
    Returns src -> (final, hops, status)."""
    f: dict[int, int] = {}
    for s, d in set(edge_list):
        if s in f and f[s] != d:
            raise ValueError("conflicting redirect")
        f[s] = d
    out: dict[int, tuple[int, int, str]] = {}
    for s in f:
        seen: dict[int, int] = {}
        cur, hops = s, 0
        while cur in f and cur not in seen:
            seen[cur] = hops
            cur = f[cur]
            hops += 1
        if cur not in f:
            out[s] = (cur, hops, "ok")
        else:
            # cur revisited: cycle = walk suffix from first visit of cur
            cyc = [v for v, h in seen.items() if h >= seen[cur]]
            status = "on_cycle" if s in cyc else "enters_cycle"
            out[s] = (min(cyc), -1, status)
    return out
