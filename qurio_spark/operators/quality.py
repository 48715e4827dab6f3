"""Data-quality profiling + per-group outlier detection.

Training-data-pipeline extensions (SURVEY §2.8): before a corpus or a
fact table feeds training, a pipeline runs (a) a one-pass
constraint/metric profile (the Deequ / dbt-test shape — completeness,
uniqueness, domain compliance, bounds) and (b) statistical outlier
flagging on numeric facts.  The reference has no equivalent (its only
"validation" is the ext/size whitelist on file upload, handlers/
sources.go); these are beyond-reference extensions.

Scale shape:
  - ``dq_profile`` is ONE aggregation over ONE scan: every metric is a
    column expression inside a single global agg (partial agg
    map-side, a one-row final), then the wide row is unpivoted to the
    long (metric, column, value) report with ``stack`` — no second
    scan, no joins.  Exact ``count(distinct)`` triggers Spark's expand
    (one input-row copy per distinct agg); at 100 TB swap
    ``approx_count_distinct`` in via ``exact_distinct=False`` — HLL
    keeps it a plain two-phase agg.
  - ``outlier_events`` computes group stats as a ``groupBy`` partial
    aggregation joined back (r15; previously an unordered per-group
    window, which shipped EVERY row of a group to one reducer — a
    dominant user funneled its whole event stream through one task).
    Map-side partials collapse a hot group inside each input
    partition before the exchange; the join back broadcasts when the
    group-stats side is small and otherwise falls to a shuffle join
    that AQE skew-splits (a window cannot be skew-split).  The test
    itself is EXACT INTEGER arithmetic: values go to cents, and the
    3x-mean test is ``cents * n > factor * sum_cents`` — long
    multiplications, no division, so the flag can never flip on a
    float boundary between engines (the r11/r12 rounding rule,
    .claude/skills/verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dq_profile(
    df: DataFrame,
    completeness: list[str] = (),
    distinctness: list[str] = (),
    bounds: list[str] = (),
    compliance: dict[str, F.Column] | None = None,
    unique_key: str | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass metric profile -> rows of (metric, column, value).

    completeness: non-null fraction per column
    distinctness: (approx) distinct count per column
    bounds:       min/max per numeric column
    compliance:   name -> boolean Column; fraction of rows satisfying
    unique_key:   distinct(key)/count == 1.0 when the key is unique

    Fractions are exact integer counts divided once at the end — both
    engines divide the same two longs, so the doubles are identical
    (IEEE 754) and need no rounding.
    """
    compliance = compliance or {}
    n = F.count(F.lit(1))
    aggs: list[tuple[str, str, F.Column]] = [("row_count", "*", n.cast("double"))]
    for c in completeness:
        aggs.append(
            ("completeness", c, F.count(F.col(c)).cast("double") / n.cast("double"))
        )
    ndistinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    for c in distinctness:
        aggs.append(("distinct_count", c, ndistinct(F.col(c)).cast("double")))
    for c in bounds:
        aggs.append(("min", c, F.min(F.col(c)).cast("double")))
        aggs.append(("max", c, F.max(F.col(c)).cast("double")))
    for name, pred in compliance.items():
        aggs.append(
            (
                "compliance",
                name,
                F.sum(pred.cast("long")).cast("double") / n.cast("double"),
            )
        )
    if unique_key is not None:
        aggs.append(
            (
                "uniqueness",
                unique_key,
                ndistinct(F.col(unique_key)).cast("double") / n.cast("double"),
            )
        )

    wide = df.agg(*[col.alias(f"_m{i}") for i, (_, _, col) in enumerate(aggs)])
    # Typed literals (F.lit), not string-spliced selectExpr: a metric
    # or column name containing a quote must not break (or inject
    # into) the generated expression.  explode(array(struct...)) is
    # the same single-row unpivot as stack().
    entries = F.array(
        *[
            F.struct(
                F.lit(metric).alias("metric"),
                F.lit(column).alias("column"),
                F.col(f"_m{i}").alias("value"),
            )
            for i, (metric, column, _) in enumerate(aggs)
        ]
    )
    return wide.select(F.explode(entries).alias("_e")).select(
        "_e.metric", "_e.column", "_e.value"
    )


def outlier_events(
    events: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    factor: int = 3,
    min_group: int = 20,
) -> DataFrame:
    """Events whose value exceeds ``factor`` x their group's mean, for
    groups with >= min_group OBSERVED (non-null) values — all-integer
    comparison (cents * n > factor * sum_cents), group stats via
    partial-agged groupBy + join back (module doc; r15 de-windowing —
    output identical to the window form, pinned by the in-window
    ``anomaly_events`` oracle).

    NULL values: a NULL-valued event is never flagged (NULL cents fail
    the comparison) and does not count toward ``n_group`` either —
    both the sum and the count range over observed values only, so the
    implied mean is the mean of the non-null values (the r13 contract;
    previously NULL rows inflated ``n_group`` and deflated the mean).
    Pinned by the NULL-bearing test in tests/test_quality.py; moot on
    the NULL-free events table."""
    cents = F.floor(F.col(value_col).cast("double") * 100.0 + F.lit(0.5)).cast("long")
    sel = events.select(
        F.col(id_col), F.col(group_col), cents.alias("value_cents")
    )
    # count/sum over the observed (non-null) cents only — identical to
    # the window form's count("value_cents")/sum("value_cents").  No
    # forced broadcast hint: one row per group can exceed the
    # threshold at scale; AQE broadcasts when it is actually small.
    stats = sel.groupBy(group_col).agg(
        F.count("value_cents").alias("n_group"),
        F.sum("value_cents").alias("_sum"),
    )
    # eqNullSafe, not a bare equi-join: groupBy (like the window form's
    # partitionBy) collects NULL group keys into one group, and an
    # inner equi-join would silently drop that group's rows — the one
    # place the join-back could diverge from the window form (pinned
    # by the NULL-group test in tests/test_quality.py)
    joined = sel.join(
        stats.withColumnRenamed(group_col, "_g"),
        sel[group_col].eqNullSafe(F.col("_g")),
    )
    return (
        joined.filter(
            (F.col("n_group") >= F.lit(min_group))
            & (
                F.col("value_cents") * F.col("n_group")
                > F.lit(factor) * F.col("_sum")
            )
        )
        .select(id_col, group_col, "value_cents", "n_group")
    )
