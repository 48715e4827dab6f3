"""Guard: no oracle_sql() relation may emit HUGEINT/UHUGEINT/DECIMAL.

Root cause of the r11/r12 driver hash-mismatch cells
(streaming_sessions_final, export_shards): DuckDB's ``sum()`` over a
BIGINT column returns HUGEINT (int128), which downstream hashers may
materialize differently from int64 (duckdb->pandas converts HUGEINT to
float64) even though the values are identical.  The repo's own
value-comparison normalizes this away, so the mismatch only shows up in
the driver's stricter hash gate.  Every oracle must therefore cast wide
aggregate results back to BIGINT / DOUBLE explicitly.

This test binds (plans) every oracle query against the sf0.001 views and
asserts the result schema contains none of the forbidden logical types.
Binding alone is enough — DuckDB resolves output types without fetching.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from qurio_spark.oracle import register_views

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = {"HUGEINT", "UHUGEINT"}
# DECIMAL is forbidden as a *top-level* output type too: duckdb->pandas
# renders it as object/Decimal which the driver hasher may stringify
# differently from Spark's double.
FORBIDDEN_PREFIXES = ("DECIMAL",)


def _violations(con, name: str, sql: str) -> list:
    rel = con.sql(sql)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if t in FORBIDDEN or t.startswith(FORBIDDEN_PREFIXES):
            bad.append((name, col, t))
    return bad


def test_no_hugeint_or_decimal_in_any_oracle():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    oracles = entrymod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    bad = []
    for name, sql in oracles.items():
        bad.extend(_violations(con, name, sql))
    assert not bad, (
        "oracle queries emit driver-hostile types (add CAST(... AS "
        f"BIGINT/DOUBLE) at the output column): {bad}"
    )


def test_known_hugeint_sites_are_cast():
    """The three historical offenders stay BIGINT forever."""
    con = duckdb.connect()
    register_views(con, SF_DIR)
    oracles = entrymod.oracle_sql()
    for name, col in [
        ("streaming_sessions_final", "closed_events"),
        ("export_shards", "n_tokens"),
        ("tpch_q12", "high_line_count"),
        ("tpch_q12", "low_line_count"),
    ]:
        if name not in oracles:
            pytest.skip(f"{name} not in oracle surface")
        rel = con.sql(oracles[name])
        types = dict(zip(rel.columns, (str(t).upper() for t in rel.types)))
        assert types.get(col) == "BIGINT", (name, col, types.get(col))
