"""Temporal join operators: as-of join and binned range join.

Neither exists as a Spark builtin (pandas-on-Spark ``merge_asof`` is
the only as-of surface, and a raw interval predicate join degenerates
to BroadcastNestedLoop/cartesian).  Both are implemented here as
compositions of DataFrame ops with the scale shape you'd want on a
1000-executor cluster:

- ``asof_join``: union both sides tagged, ONE hash shuffle on the key,
  a running ``last(ignorenulls)`` window carries the most recent right
  payload onto each left row.  Cost is a single sort-merge pass per
  key partition — no join multiplicity on duplicate keys, no range
  explosion (contrast: key-equi join + filter + argmax pays
  |left_per_key| x |right_per_key| intermediate rows).
- ``range_join_binned``: quantize the time axis into ``bin_width``
  buckets; each left row explodes to the handful of buckets its
  [lo, hi] window overlaps, the right row sits in exactly one bucket,
  and the match becomes an EQUALITY join on the bucket id (plus any
  equi-keys) with a residual range filter.  Every true pair joins in
  exactly one bucket (the right row's), so no post-join dedup is
  needed.  Shuffle is hash-on-bucket — AQE-splittable, skew-safe —
  instead of a nested-loop over the cross product.

Reference parity note: the reference has no temporal joins (SURVEY
§2.7); this is part of the §2.8 extension surface (training-data
pipelines: attribution, nearest-snapshot enrichment, proximity
features).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] | None = None,
    direction: str = "backward",
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the
    right row with the largest ``right_ts`` <= ``left_ts`` (direction
    ``backward``, inclusive) or the smallest ``right_ts`` >= ``left_ts``
    (``forward``, inclusive) within the same ``on`` key group.

    Left rows with no candidate keep NULL payload columns (left-join
    semantics).  ``right`` must be unique per (``on``, ``right_ts``) —
    pre-reduce it (e.g. argmax) if it is not; ties would otherwise be
    partition-order dependent.  The matched right timestamp is exposed
    as ``matched_ts_col`` so callers can compute gaps or enforce a
    tolerance with one extra filter.

    Scale shape: one hash shuffle on ``on`` (the union'd window), the
    output stays partitioned by ``on`` for downstream per-key aggs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in set(on) | {right_ts}]
    clashes = (set(right_payload) | {matched_ts_col}) & set(left.columns)
    if clashes:
        # silently overwriting a left column would corrupt the output
        raise ValueError(
            f"right payload/matched_ts columns collide with left: {sorted(clashes)}"
            " — alias the right side or pass a different matched_ts_col"
        )
    payload_struct = F.struct(
        *[F.col(c) for c in right_payload],
        F.col(right_ts).alias(matched_ts_col),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        payload_struct.alias("__match"),
        F.lit(0).alias("__side"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (__side 0) sort before left rows at equal __t in both
    # directions -> the join is inclusive of exact-timestamp matches
    order = (
        [F.col("__t").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__match", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    for c in right_payload:
        out = out.withColumn(c, F.col(f"__m.{c}"))
    out = out.withColumn(matched_ts_col, F.col(f"__m.{matched_ts_col}"))
    return out.drop("__t", "__side", "__match", "__m")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lo: float,
    hi: float,
    bin_width: float | None = None,
    on: Sequence[str] | None = None,
    how: str = "inner",
    left_key: Sequence[str] | None = None,
) -> DataFrame:
    """Interval join: pairs (l, r) where
    ``l[left_time] + lo <= r[right_time] <= l[left_time] + hi``
    (and optional equi-keys ``on``), computed as an equality join on a
    quantized time bucket instead of a nested-loop range predicate.

    Time columns must be numeric (epoch seconds — convert timestamps
    with :func:`qurio_spark.functions.events_ts.epoch_secs` first,
    which is the timezone-free path).  ``bin_width`` defaults to the
    window span ``hi - lo`` so each left row lands in at most 2-3
    buckets; every true pair meets in exactly the right row's single
    bucket, so the output needs no dedup.

    ``how='left'`` keeps unmatched left rows (one NULL-right row each)
    with standard left-join semantics, and requires ``left_key`` — the
    column(s) that uniquely identify a left row.  The key is required
    because the binned form EXPLODES each left row into 2-3 bucket
    copies; collapsing back to per-left-row semantics needs an
    identity to join the matches against (a synthetic surrogate like
    ``monotonically_increasing_id`` would be recomputed differently on
    the two lineage branches — silent corruption, not an option).
    Plan shape: the bucket-equality inner join, then one hash join
    back to the left table on ``left_key`` — two shuffles total,
    still never a nested loop.  Grouped counts over the result need
    ``count(<right col>)``, not ``count(*)``.

    Column collisions: right columns that clash with left names are
    suffixed ``_r``.
    """
    if hi < lo:
        raise ValueError(f"empty range: lo={lo} hi={hi}")
    if bin_width is None:
        bin_width = max(hi - lo, 1e-9)
    on = list(on or [])
    lcols = set(left.columns)
    ren = {c: (c + "_r" if c in lcols and c not in on else c) for c in right.columns}
    r = right.select(
        *[F.col(c).alias(a) for c, a in ren.items()],
        F.floor(F.col(right_time) / F.lit(bin_width)).cast("long").alias("__bin"),
    )
    l = (
        left.withColumn("__lo", F.col(left_time) + F.lit(lo))
        .withColumn("__hi", F.col(left_time) + F.lit(hi))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo") / F.lit(bin_width)).cast("long"),
                    F.floor(F.col("__hi") / F.lit(bin_width)).cast("long"),
                )
            ),
        )
    )
    rt = ren[right_time]
    cond = [l["__bin"] == r["__bin"]] + [l[k] == r[k] for k in on]
    in_range = (F.col(rt) >= F.col("__lo")) & (F.col(rt) <= F.col("__hi"))
    inner = (
        l.join(r, cond)
        .filter(in_range)
        .drop("__lo", "__hi")
        .drop(r["__bin"])
        .drop(l["__bin"])
        .drop(*[r[k] for k in on])
    )
    if how == "inner":
        return inner
    if how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    if not left_key:
        raise ValueError(
            "how='left' requires left_key (columns uniquely identifying a"
            " left row) — the exploded bins need an identity to collapse on"
        )
    left_key = list(left_key)
    # every true pair survives in `inner` exactly once; join the match
    # rows (key + right payload) back to the ORIGINAL left table so
    # unmatched left rows surface with NULL right columns
    right_out = [a for c, a in ren.items() if a not in set(on)]
    matches = inner.select(*left_key, *right_out)
    return left.join(matches, on=left_key, how="left")


def gap_fill_locf(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Regular-grid resample with forward fill (LOCF — last
    observation carried forward): aggregate ``value_col`` per
    (``key_cols``, ``unit`` bucket), then EMIT EVERY bucket of the data's
    [min, max] range for every key — buckets with no rows carry the
    previous bucket's value (NULL before the first observation), plus
    ``n=0``.  The time-series normalization step the reference's
    event analytics lacks: dashboards and window models need a dense
    regular grid, not the sparse buckets a plain groupBy yields.

    Scale shape: the grid is ``sequence()``-generated from ONE global
    min/max row cross-joined with the distinct keys — grid size =
    range/step x |keys|, independent of the event count; the fill is
    one ``last(ignorenulls)`` window per key over the grid (bounded
    rows per partition), never a window over raw events.  The event
    table itself sees one partial-agg shuffle, nothing else."""
    from pyspark.sql.window import Window

    bucket = F.date_trunc(unit, F.col(ts_col))
    agg = df.groupBy(*key_cols, bucket.alias("bucket")).agg(
        F.count("*").alias("n"), F.sum(value_col).alias("v")
    )
    bounds = df.agg(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"interval 1 {unit}"))
        ).alias("bucket")
    )
    keys = df.select(*key_cols).distinct()
    dense = keys.crossJoin(grid)
    joined = dense.join(agg, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *key_cols,
        F.col("bucket"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )
