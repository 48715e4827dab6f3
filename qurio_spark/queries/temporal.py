"""Temporal-join queries over the events table (as-of attribution,
range-proximity features) — the §2.8 extension family backed by
``qurio_spark.operators.temporal``.

Both queries work in timezone-free epoch seconds (the events ``ts``
contract, see functions/events_ts.py) so the DuckDB oracles compare
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from qurio_spark.functions.numeric import stable_round
from qurio_spark.operators.temporal import asof_join, range_join_binned

from .common import _epoch_secs, _events


def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→view attribution: each purchase is attributed to the
    most recent view by the same user at-or-before the purchase
    (classic last-touch as-of join), then rolled up per user.

    Scale shape: views are pre-reduced per (user, second) so the as-of
    right side is unique; the union+window runs in ONE hash shuffle on
    user_id and the per-user rollup reuses that partitioning (no second
    exchange for the groupBy)."""
    ev = _events(spark, sf_dir)
    ev = ev.withColumn("tsec", _epoch_secs(ev))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tsec", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "tsec")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    attributed = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="tsec",
        right_ts="tsec",
        right_payload=["view_event_id"],
        direction="backward",
        matched_ts_col="view_tsec",
    )
    return attributed.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.count("view_event_id").alias("n_attributed"),
        stable_round(
            F.sum(F.when(F.col("view_event_id").isNotNull(), F.col("value"))), 2
        ).alias("attributed_value"),
        F.min(F.col("tsec") - F.col("view_tsec")).alias("min_gap_secs"),
        F.max(F.col("tsec") - F.col("view_tsec")).alias("max_gap_secs"),
        stable_round(F.avg(F.col("tsec") - F.col("view_tsec")), 2).alias(
            "avg_gap_secs"
        ),
    )


def events_asof_attribution_sql() -> str:
    return """
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ms(ts::TIMESTAMP) // 1000 AS tsec
  FROM events
),
p AS (SELECT event_id, user_id, tsec, value FROM ev
      WHERE event_type = 'purchase'),
v AS (SELECT user_id, tsec, max(event_id) AS view_event_id FROM ev
      WHERE event_type = 'view' GROUP BY 1, 2),
m AS (
  SELECT p.user_id, p.value, p.tsec, v.view_event_id,
         v.tsec AS view_tsec
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND p.tsec >= v.tsec
)
SELECT user_id,
       count(*) AS n_purchases,
       count(view_event_id) AS n_attributed,
       (floor(CAST(sum(CASE WHEN view_event_id IS NOT NULL THEN value END)
              AS DOUBLE) * 100.0 + 0.5) / 100.0) AS attributed_value,
       min(tsec - view_tsec) AS min_gap_secs,
       max(tsec - view_tsec) AS max_gap_secs,
       (floor(CAST(avg(tsec - view_tsec) AS DOUBLE) * 100.0 + 0.5) / 100.0)
         AS avg_gap_secs
FROM m GROUP BY user_id"""


def q_events_range_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unkeyed interval join: for every error event, how many clicks
    (by ANY user) landed within ±60 s — binned-bucket equality join
    (bin = 120 s), then a histogram of errors by nearby-click count.

    Scale shape: the bucket id is the join key (hash shuffle,
    AQE-splittable), each error explodes to ≤2 buckets, each click to
    exactly 1 — candidate pairs are bounded by events-per-2-minutes,
    never |errors| × |clicks|."""
    ev = _events(spark, sf_dir)
    ev = ev.withColumn("tsec", _epoch_secs(ev).cast("double"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "tsec", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "tsec"
    )
    pairs = range_join_binned(
        errors, clicks, left_time="tsec", right_time="tsec", lo=-60.0, hi=60.0
    )
    per_error = pairs.groupBy("event_id").agg(
        F.count("*").alias("nearby_clicks")
    )
    with_zero = (
        errors.join(per_error, "event_id", "left")
        .withColumn("nearby_clicks", F.coalesce("nearby_clicks", F.lit(0)))
    )
    return with_zero.groupBy("nearby_clicks").agg(
        F.count("*").alias("n_errors"),
        stable_round(F.sum("value"), 2).alias("err_value"),
    )


def events_range_proximity_sql() -> str:
    return """
WITH ev AS (
  SELECT event_id, event_type, value,
         CAST(epoch_ms(ts::TIMESTAMP) // 1000 AS DOUBLE) AS tsec
  FROM events
),
e AS (SELECT event_id, tsec, value FROM ev WHERE event_type = 'error'),
c AS (SELECT tsec FROM ev WHERE event_type = 'click'),
per_error AS (
  SELECT e.event_id, e.value, count(c.tsec) AS nearby_clicks
  FROM e LEFT JOIN c
    ON c.tsec >= e.tsec - 60.0 AND c.tsec <= e.tsec + 60.0
  GROUP BY 1, 2
)
SELECT nearby_clicks, count(*) AS n_errors,
       (floor(CAST(sum(value) AS DOUBLE) * 100.0 + 0.5) / 100.0)
         AS err_value
FROM per_error GROUP BY nearby_clicks"""


def q_events_asof_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (the other direction of the attribution
    query): each error is paired with the NEXT click by the same user
    at-or-after it — time-to-recovery — then rolled up per user.
    Same one-shuffle union+window shape, descending scan order."""
    ev = _events(spark, sf_dir)
    ev = ev.withColumn("tsec", _epoch_secs(ev))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "tsec"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "tsec")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    paired = asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="tsec",
        right_ts="tsec",
        right_payload=["click_event_id"],
        direction="forward",
        matched_ts_col="click_tsec",
    )
    return paired.groupBy("user_id").agg(
        F.count("*").alias("n_errors"),
        F.count("click_event_id").alias("n_recovered"),
        F.min(F.col("click_tsec") - F.col("tsec")).alias("min_recovery_secs"),
        stable_round(F.avg(F.col("click_tsec") - F.col("tsec")), 2).alias(
            "avg_recovery_secs"
        ),
    )


def events_asof_recovery_sql() -> str:
    return """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         epoch_ms(ts::TIMESTAMP) // 1000 AS tsec
  FROM events
),
e AS (SELECT event_id, user_id, tsec FROM ev WHERE event_type = 'error'),
c AS (SELECT user_id, tsec, max(event_id) AS click_event_id FROM ev
      WHERE event_type = 'click' GROUP BY 1, 2),
m AS (
  SELECT e.user_id, e.tsec, c.click_event_id, c.tsec AS click_tsec
  FROM e ASOF LEFT JOIN c
    ON e.user_id = c.user_id AND e.tsec <= c.tsec
)
SELECT user_id,
       count(*) AS n_errors,
       count(click_event_id) AS n_recovered,
       min(click_tsec - tsec) AS min_recovery_secs,
       (floor(CAST(avg(click_tsec - tsec) AS DOUBLE) * 100.0 + 0.5) / 100.0)
         AS avg_recovery_secs
FROM m GROUP BY user_id"""


def q_events_range_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed LEFT interval join (the round-7 ``how='left'`` path of
    ``range_join_binned``): each purchase keeps the error events by the
    SAME user in the 2 minutes leading up to it — and purchases with no
    such error survive as NULL-mate rows, so the zero bucket of the
    per-purchase histogram falls straight out of the left join instead
    of needing the separate join-back ``events_range_proximity`` does.

    Scale shape: the inner bucket-equality join plus ONE hash join back
    to the left table on its key — still never a nested loop over
    |purchases| x |errors|."""
    ev = _events(spark, sf_dir)
    ev = ev.withColumn("tsec", _epoch_secs(ev).cast("double"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tsec", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", "tsec"
    )
    pairs = range_join_binned(
        purchases, errors, left_time="tsec", right_time="tsec",
        lo=-120.0, hi=0.0, on=["user_id"], how="left",
        left_key=["event_id"],
    )
    per_purchase = pairs.groupBy("event_id", "value").agg(
        F.count("err_id").alias("nearby_errors")
    )
    return per_purchase.groupBy("nearby_errors").agg(
        F.count("*").alias("n_purchases"),
        stable_round(F.sum("value"), 2).alias("purchase_value"),
    )


def events_range_left_sql() -> str:
    return """
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
         CAST(epoch_ms(ts::TIMESTAMP) // 1000 AS DOUBLE) AS tsec
  FROM events
),
p AS (SELECT event_id, user_id, tsec, value FROM ev
      WHERE event_type = 'purchase'),
e AS (SELECT event_id AS err_id, user_id, tsec FROM ev
      WHERE event_type = 'error'),
per_purchase AS (
  SELECT p.event_id, p.value, count(e.err_id) AS nearby_errors
  FROM p LEFT JOIN e
    ON p.user_id = e.user_id
   AND e.tsec >= p.tsec - 120.0 AND e.tsec <= p.tsec
  GROUP BY 1, 2
)
SELECT nearby_errors, count(*) AS n_purchases,
       (floor(CAST(sum(value) AS DOUBLE) * 100.0 + 0.5) / 100.0)
         AS purchase_value
FROM per_purchase GROUP BY nearby_errors"""
