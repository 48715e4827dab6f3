"""Shared Spark-vs-DuckDB oracle comparison.

One implementation of the value-normalization and compare rules used by
both the ad-hoc ``tools/oracle_check.py`` CLI and the committed
``tests/test_queries_full.py`` gate, mirroring the driver's t2
correctness semantics: row count, column-name set, and
order-insensitive values (exact for ints/strings, 1e-9 rounding for
floats — queries are expected to round any float they emit).
"""

from __future__ import annotations

import decimal
import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(con, sf_dir: str) -> None:
    """Register the standard parquet tables as DuckDB views."""
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe ordering: sort on the repr key, compare the raw tuples
    # (mixed None/int cells — e.g. ROLLUP subtotal markers — would
    # break tuple comparison)
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(scols, srows, dcols, drows) -> list[str]:
    """Return a list of human-readable problems (empty = match)."""
    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if not problems:
        a = norm_rows(scols, [tuple(r) for r in srows])
        b = norm_rows(dcols, drows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            problems.append(
                f"values differ in {len(diffs)}/{len(a)} rows; first: "
                f"spark={diffs[0][0]} duck={diffs[0][1]}" if diffs
                else "values differ (set mismatch)"
            )
    return problems
