"""Motif finding — declarative subgraph-pattern matching over an edge
table, the GraphFrames ``find()`` surface (Dave et al. 2016; itself the
join-based "multiway theta-join" strategy of classic SPARQL/datalog
evaluation): a pattern like ``"a->b; b->c; !c->a"`` returns one row per
binding of the named vertex variables.

Contract:

- pattern grammar: ';'-separated terms, each ``x->y`` (a directed edge
  must exist from the binding of x to the binding of y) or ``!x->y`` (no
  such edge may exist); variable names are ``[A-Za-z_]\\w*``;
- bindings are HOMOMORPHISMS (GraphFrames semantics): two different
  variables MAY bind the same vertex — add ``a != b`` filters downstream
  if injective matches are wanted;
- matching runs over the DISTINCT edge set (parallel edges do not
  multiply bindings);
- every variable must appear in at least one POSITIVE term (a negation
  over an otherwise-unbound variable has no finite binding set);
- the positive terms must form a CONNECTED pattern (variable-sharing
  graph); a disconnected pattern would be a cartesian product of its
  pieces — raise instead of silently exploding;
- output: one long column per variable, in first-appearance order.

Scale shape: one hash join per positive term, always joining on at least
one already-bound variable (greedy connected ordering), so every join is
key-equi on vertex ids — Catalyst picks shuffle-hash/sort-merge and AQE
handles skew; negations become LEFT ANTI joins at the end (never
materializing the complement). No windows, no Python, no cartesian
products by construction.

Reference surface parity: GraphFrames `find` additionally supports
anonymous vertices/edges and named edges; those desugar to this core
(anonymous vertex = fresh variable projected away; named edges are only
meaningful with edge attributes, which an (src,dst) table doesn't carry).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^(!?)\s*([A-Za-z_]\w*)\s*->\s*([A-Za-z_]\w*)$")


def _parse(pattern: str) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    pos: list[tuple[str, str]] = []
    neg: list[tuple[str, str]] = []
    terms = [t.strip() for t in pattern.split(";") if t.strip()]
    if not terms:
        raise ValueError("find_motifs: empty pattern")
    for t in terms:
        m = _TERM_RE.match(t)
        if not m:
            raise ValueError(f"find_motifs: bad term {t!r}")
        bang, x, y = m.groups()
        (neg if bang else pos).append((x, y))
    if not pos:
        raise ValueError("find_motifs: need at least one positive term")
    bound = {v for t in pos for v in t}
    for x, y in neg:
        if x not in bound or y not in bound:
            raise ValueError(
                f"find_motifs: negated term !{x}->{y} uses a variable "
                "not bound by any positive term"
            )
    return pos, neg


def _order_connected(pos: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Greedy reorder so every term after the first shares a variable with
    the already-joined prefix; raises if the pattern is disconnected."""
    remaining = list(pos)
    ordered = [remaining.pop(0)]
    bound = set(ordered[0])
    while remaining:
        for i, (x, y) in enumerate(remaining):
            if x in bound or y in bound:
                ordered.append(remaining.pop(i))
                bound |= {x, y}
                break
        else:
            raise ValueError(
                "find_motifs: pattern is disconnected — "
                f"cannot reach {remaining} from variables {sorted(bound)}"
            )
    return ordered


def find_motifs(edges: DataFrame, pattern: str) -> DataFrame:
    """Bindings of ``pattern`` over the distinct (src,dst) edge set; one
    long column per variable, first-appearance order."""
    pos, neg = _parse(pattern)
    order: list[str] = []
    for x, y in pos:
        for v in (x, y):
            if v not in order:
                order.append(v)

    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .distinct()
    )

    def term_df(x: str, y: str) -> DataFrame:
        if x == y:  # self-loop term
            return e.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(x)
            )
        return e.select(F.col("src").alias(x), F.col("dst").alias(y))

    ordered = _order_connected(pos)
    x0, y0 = ordered[0]
    acc = term_df(x0, y0)
    for x, y in ordered[1:]:
        t = term_df(x, y)
        on = [v for v in t.columns if v in acc.columns]
        acc = acc.join(t, on=on)

    for x, y in neg:
        if x == y:
            t = e.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(x)
            )
            acc = acc.join(t, on=[x], how="left_anti")
        else:
            t = e.select(F.col("src").alias(x), F.col("dst").alias(y))
            acc = acc.join(t, on=[x, y], how="left_anti")

    return acc.select(*order)


def find_motifs_single_node(
    edge_list: list[tuple[int, int]], pattern: str
) -> set[tuple[int, ...]]:
    """Brute-force binding set (tuple per variable in first-appearance
    order) — the pytest parity oracle."""
    import itertools

    pos, neg = _parse(pattern)
    _order_connected(pos)  # same validation surface as the Spark path
    order: list[str] = []
    for x, y in pos:
        for v in (x, y):
            if v not in order:
                order.append(v)
    es = set(edge_list)
    verts = sorted({v for t in es for v in t})
    out = set()
    for combo in itertools.product(verts, repeat=len(order)):
        b = dict(zip(order, combo))
        if all((b[x], b[y]) in es for x, y in pos) and not any(
            (b[x], b[y]) in es for x, y in neg
        ):
            out.add(tuple(b[v] for v in order))
    return out
