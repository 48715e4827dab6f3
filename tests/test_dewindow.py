"""Planted hot-group checks for the r15 de-windowed sites (VERDICT
r14 #2): ``outlier_events`` (group stats via partial-agged groupBy +
join back — an UNORDERED whole-group window has no WindowGroupLimit
rescue, so the agg rewrite is required) and ``q_events_top_users``
(rank-filter top-n through ``operators/topn.grouped_top_n``, whose
map-side WindowGroupLimit(Partial) is asserted on the skewed plan).
Both must be output-identical to the window forms, on a skewed input
where one group dominates."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qurio_spark.operators.quality import outlier_events


def _hot_events(spark, n_hot=100_000, n_cold_groups=50):
    """One dominant user holds n_hot rows; 50 cold users hold 30 each.
    Values are deterministic id arithmetic with a few planted spikes."""
    hot = spark.range(n_hot).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("event_id"),
        F.lit("hot_user").alias("user_id"),
        # mostly ~10.00, with every 10_000th row a 1000.00 spike
        F.when(F.col("id") % 10_000 == 0, F.lit(1000.0))
        .otherwise(10.0 + (F.col("id") % 7).cast("double") / 100.0)
        .alias("value"),
    )
    cold = spark.range(n_cold_groups * 30).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("event_id"),
        F.concat(F.lit("u"), (F.col("id") % n_cold_groups).cast("string")).alias(
            "user_id"
        ),
        (5.0 + (F.col("id") % 11).cast("double")).alias("value"),
    )
    return hot.unionByName(cold)


class TestOutlierEventsHotGroup:
    def test_matches_window_form_under_skew(self, spark):
        ev = _hot_events(spark)
        got = {
            (r["event_id"], r["n_group"])
            for r in outlier_events(ev, factor=3, min_group=20).collect()
        }
        cents = F.floor(F.col("value").cast("double") * 100.0 + F.lit(0.5)).cast(
            "long"
        )
        w = Window.partitionBy("user_id")
        want = {
            (r["event_id"], r["n_group"])
            for r in (
                ev.select("event_id", "user_id", cents.alias("value_cents"))
                .withColumn("n_group", F.count("value_cents").over(w))
                .withColumn("_sum", F.sum("value_cents").over(w))
                .filter(
                    (F.col("n_group") >= 20)
                    & (F.col("value_cents") * F.col("n_group") > 3 * F.col("_sum"))
                )
                .collect()
            )
        }
        assert got == want
        # the planted spikes are exactly the hot group's flagged rows
        assert {e for e, _ in got if e.startswith("e")} == {
            f"e{i}" for i in range(0, 100_000, 10_000)
        }

    def test_schema_unchanged(self, spark):
        ev = _hot_events(spark, n_hot=1000, n_cold_groups=2)
        out = outlier_events(ev, factor=3, min_group=20)
        assert out.columns == ["event_id", "user_id", "value_cents", "n_group"]


class TestTopUsersHotGroup:
    def test_matches_single_window_under_skew(self, spark, tmp_path):
        """One event_type with 20k distinct users (the billion-user
        shape scaled down), two small types, and a planted tie on n
        broken by user_id — the query must reproduce the reference
        single-window top-3 exactly, ranks included, and its plan
        must carry the map-side WindowGroupLimit(Partial) that keeps
        the hot type off a single reducer."""
        from qurio_spark.queries.events_tpch import q_events_top_users

        big = spark.range(20_000).select(
            F.lit("click").alias("event_type"),
            F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
                "user_id"
            ),
            # duplicate rows per user => per-user counts with ties at
            # the top: users 0 and 1 both get 5 events
            F.when(F.col("id") <= 1, 5).otherwise(1 + (F.col("id") % 3)).alias(
                "_reps"
            ),
        )
        small = spark.range(4).select(
            F.lit("view").alias("event_type"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("user_id"),
            F.lit(2).alias("_reps"),
        )
        ev = (
            big.unionByName(small)
            .withColumn("_x", F.explode(F.sequence(F.lit(1), F.col("_reps"))))
            .select(
                "event_type",
                "user_id",
                F.lit("e").alias("props"),
                F.lit(0).alias("ts"),
                F.lit(0.0).alias("value"),
                F.monotonically_increasing_id().cast("string").alias("event_id"),
            )
        )
        p = str(tmp_path / "events.parquet")
        ev.write.parquet(p)

        import qurio_spark.queries.common as common

        # q_events_top_users reads <sf_dir>/events.parquet via _events
        got = sorted(
            map(
                tuple,
                q_events_top_users(spark, str(tmp_path))
                .select("event_type", "user_id", "n", "rank")
                .collect(),
            )
        )
        counts = (
            common._events(spark, str(tmp_path))
            .groupBy("event_type", "user_id")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("event_type").orderBy(
            F.desc("n"), F.asc("user_id")
        )
        want = sorted(
            map(
                tuple,
                counts.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 3)
                .select("event_type", "user_id", "n", "rank")
                .collect(),
            )
        )
        assert got == want
        # the tie landed in the result deterministically
        click_top = [r for r in got if r[0] == "click"]
        assert [r[1] for r in click_top[:2]] == ["u000000", "u000001"]
        # the scale property: the map-side pre-filter is in the plan
        from qurio_spark.operators.topn import has_partial_group_limit

        assert has_partial_group_limit(
            q_events_top_users(spark, str(tmp_path))
        )
