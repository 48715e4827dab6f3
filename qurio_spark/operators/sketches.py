"""Sketch aggregates — the sublinear-memory statistics a 100 TB
pipeline runs instead of exact forms.

Exact distinct counts and exact percentiles shuffle every distinct
value / sort every group; the sketch forms keep fixed-size state per
group and merge associatively (one partial-agg shuffle, no sort):

  - ``approx_count_distinct`` (HyperLogLog++): relative standard
    deviation ``rsd`` controls sketch size (~1.04/sqrt(m)).
  - ``approx_percentile`` (KLL-style quantile sketch): ``accuracy``
    controls rank error (err <= 1/accuracy).

Both are Spark built-ins (JVM-side, codegen); this module just fixes
the engine's default tolerances and pairs them with their exact twins
so tests can assert the error bounds hold (tests/test_sketches.py).
The exact twins stay the oracle-checked driver queries
(value_percentiles, stats_fanin) — sketches are intentionally
engine-specific, so they are bounds-tested, not hash-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default HLL relative standard deviation (Spark default 0.05)
DEFAULT_RSD = 0.02
#: default quantile-sketch accuracy (rank error <= 1/accuracy)
DEFAULT_ACCURACY = 10_000


def approx_user_stats(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    rsd: float = DEFAULT_RSD,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group sketch statistics: approx distinct users + approx
    median/p90 of the value column — fixed memory per group regardless
    of group size."""
    return events.groupBy(group_col).agg(
        F.approx_count_distinct(user_col, rsd=rsd).alias("approx_users"),
        F.percentile_approx(value_col, 0.5, accuracy).alias("approx_p50"),
        F.percentile_approx(value_col, 0.9, accuracy).alias("approx_p90"),
    )


def exact_user_stats(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The exact twin (for error-bound tests and small data)."""
    return events.groupBy(group_col).agg(
        F.countDistinct(user_col).alias("exact_users"),
        F.percentile(value_col, 0.5).alias("exact_p50"),
        F.percentile(value_col, 0.9).alias("exact_p90"),
    )
