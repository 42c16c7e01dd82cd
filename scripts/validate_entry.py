"""Local mimic of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark at sf0.01 and the matching
``oracle_sql()[name]`` in DuckDB, compares row count, column names, and an
order-insensitive value hash (rows sorted by their string representation,
columns sorted by name). Prints one line per query.

Usage: python scripts/validate_entry.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as se
    from connected_components_3d_spark.session import get_spark

    spark = get_spark("validate-entry")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = table_hash(srows, scols), table_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                # show a few differing lines for debugging
                so = sorted(
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                do = sorted(
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                )
                diffs = [(a, b) for a, b in zip(so, do) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark:  {a}\n      duckdb: {b}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(srows)} hash-match")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
