"""Engine-portable numeric helpers.

``stable_round`` exists because engines disagree on ROUND semantics for
doubles: Spark rounds the exact binary expansion (HALF_UP on
BigDecimal(double)), DuckDB rounds the shortest decimal representation
— so round(0.86874999999999993, 4) is 0.8687 on Spark but 0.8688 on
DuckDB.  ``floor(x * 10^d + 0.5) / 10^d`` is plain IEEE arithmetic,
bit-identical everywhere, which keeps rounded scores hash-comparable
across engines (the driver's t2 gate hashes values).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def stable_round(col: Column | str, digits: int) -> Column:
    """Engine-portable round-half-up(ish): floor(x*10^d + 0.5)/10^d.

    Matches the DuckDB fragment produced by :func:`stable_round_sql`.
    (For negatives this is half-toward-+inf, not half-away — consistent
    across engines, which is what matters for oracle parity.)
    """
    if isinstance(col, str):
        col = F.col(col)
    scale = F.lit(float(10**digits))
    return F.floor(col.cast("double") * scale + F.lit(0.5)) / scale


def stable_round_sql(expr: str, digits: int) -> str:
    """DuckDB-SQL twin of :func:`stable_round`."""
    scale = float(10**digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
