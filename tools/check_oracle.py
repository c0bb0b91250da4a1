#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin at a
given scale factor, compare row-count, column names, and sorted values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

``--out PATH`` (anywhere in argv) additionally writes a JSON artifact
with per-query status + wall seconds — the committed evidence form of
the full-registry sweep (VERDICT r12 item 3: the sf0.1 sweep was a
doc-only claim; now it persists like every other measurement).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def norm(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            if isinstance(v, list):
                v = tuple(round(x, 9) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main():
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [--out PATH] [sf_dir] [query ...]")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duck_con(sf_dir)
    oracles = e.oracle_sql()
    failures = []
    record = {}
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        wall = round(time.monotonic() - t0, 3)
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows")
            record[name] = {
                "status": "rows_only" if srows else "FAIL: 0 rows",
                "rows": len(srows), "wall_s": wall,
            }
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            sn = norm([[r[c] for c in scols] for r in srows], scols)
            dn = norm(drows, dcols)
            if sn != dn:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name}: FAIL {problems}")
            record[name] = {
                "status": "FAIL: " + "; ".join(problems)[:300],
                "rows": len(srows), "wall_s": wall,
            }
        else:
            print(f"{name}: OK ({len(srows)} rows)")
            record[name] = {
                "status": "match", "rows": len(srows), "wall_s": wall,
            }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(record),
                    "n_failures": len(failures),
                    "queries": record,
                },
                fh, indent=1,
            )
        print(f"wrote {out_path}")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall queries match oracle")


if __name__ == "__main__":
    main()
