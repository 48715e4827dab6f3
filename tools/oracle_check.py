#!/usr/bin/env python
"""Local emulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (compare rules live in
``qurio_spark.oracle`` and are shared with tests/test_queries_full.py).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from qurio_spark.goldens import golden_for, rows_hash
from qurio_spark.operators.cachectl import release_caches
from qurio_spark.oracle import compare, register_views
from qurio_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    register_views(con, sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = None
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            # cachectl protocol: the 149-query sweep must not
            # accumulate the caches operators attach to their results
            release_caches(sdf)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed += 1
            if sdf is not None:  # a failed query must not leak caches
                release_caches(sdf)
            continue
        if name not in oracles:
            # rows-only entries still get a REAL check when a golden
            # row-hash is pinned for this sf (qurio_spark/goldens.py)
            want = golden_for(name, sf_dir)
            if want is not None:
                got = rows_hash(scols, srows)
                if got == want:
                    print(f"PASS {name} (golden row-hash, {len(srows)} rows) "
                          f"[{time.time()-t0:.1f}s]")
                    passed += 1
                else:
                    print(f"FAIL {name}: golden row-hash drifted: {got}")
                    failed += 1
                continue
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed += 1
            continue
        problems = compare(scols, srows, dcols, drows)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
