"""Distributed prefix sum (operators/prefix) — exactness vs the plain
window form, bucket monotonicity, and the single-dominant-source shape
the r13 verdict flagged (VERDICT r13 #1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qurio_spark.operators.prefix import (
    distributed_cumsum,
    order_key_boundaries,
)


def _window_cumsum(df, value, part, order, out):
    w = (
        Window.partitionBy(part)
        .orderBy(F.asc(order))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def _mkdf(spark, n, n_sources):
    """Deterministic synthetic rows: value derived from id arithmetic."""
    return spark.range(n).select(
        F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias("s"),
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("k"),
        (F.pmod(F.col("id") * 2654435761, F.lit(97)) + 1).alias("v"),
    )


class TestDistributedCumsum:
    @pytest.mark.parametrize("n_sources", [1, 5])
    def test_matches_window_cumsum(self, spark, n_sources):
        df = _mkdf(spark, 3000, n_sources)
        got = {
            (r["s"], r["k"]): r["cum"]
            for r in distributed_cumsum(
                df, "v", "s", "k", "cum", n_buckets=8, sample_target=200,
                small_threshold=0,
            ).collect()
        }
        want = {
            (r["s"], r["k"]): r["cum"]
            for r in _window_cumsum(df, "v", "s", "k", "cum").collect()
        }
        assert got == want

    def test_multiple_buckets_actually_used(self, spark):
        """The dominant-source fix is only real if one source's rows
        span many buckets."""
        df = _mkdf(spark, 3000, 1)
        out = distributed_cumsum(
            df, "v", "s", "k", "cum", n_buckets=8, sample_target=200,
            keep_bucket="b", small_threshold=0,
        )
        per_bucket = {
            r["b"]: r["n"]
            for r in out.groupBy("b").agg(F.count("*").alias("n")).collect()
        }
        assert len(per_bucket) >= 6  # 8 requested; sampling may merge a couple
        assert max(per_bucket.values()) < 3000 / 2  # no degenerate bucket

    def test_tiny_input_degenerates_to_window(self, spark):
        df = _mkdf(spark, 3, 2)
        got = {
            (r["s"], r["k"]): r["cum"]
            for r in distributed_cumsum(df, "v", "s", "k", "cum").collect()
        }
        want = {
            (r["s"], r["k"]): r["cum"]
            for r in _window_cumsum(df, "v", "s", "k", "cum").collect()
        }
        assert got == want

    def test_numeric_order_key(self, spark):
        df = spark.range(500).select(
            F.lit("s").alias("s"),
            F.col("id").alias("k"),
            F.lit(3).alias("v"),
        )
        out = distributed_cumsum(df, "v", "s", "k", "cum", n_buckets=4,
                                 sample_target=50, small_threshold=0).collect()
        assert {r["k"]: r["cum"] for r in out} == {
            i: 3 * (i + 1) for i in range(500)
        }

    def test_reserved_column_collision_raises(self, spark):
        df = _mkdf(spark, 10, 1).withColumn("_psb", F.lit(1))
        with pytest.raises(ValueError, match="reserved"):
            distributed_cumsum(df, "v", "s", "k", "cum")

    def test_keep_bucket_collision_raises(self, spark):
        df = _mkdf(spark, 10, 1).withColumn("b", F.lit(1))
        with pytest.raises(ValueError, match="reserved"):
            distributed_cumsum(df, "v", "s", "k", "cum", keep_bucket="b")

    def test_default_buckets_tolerates_non_numeric_conf(self, spark):
        """Platform-specific values like 'auto' (vanilla Spark rejects
        them at conf.set, so simulate the read) must fall back instead
        of crashing every prefix-sum caller."""
        from qurio_spark.operators.prefix import default_buckets

        class _FakeConf:
            def get(self, k, d=None):
                return "auto"

        class _FakeSpark:
            conf = _FakeConf()

        assert default_buckets(_FakeSpark()) == 200
        assert default_buckets(spark) == int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )

    def test_sample_df_prunes_to_order_key(self, spark):
        """Boundary passes accept a cheaper sibling frame; results stay
        identical to sampling from df itself."""
        df = _mkdf(spark, 2000, 2)
        sample = df.select("k")
        a = distributed_cumsum(
            df, "v", "s", "k", "cum", n_buckets=6, sample_df=sample,
            sample_target=150, small_threshold=0,
        ).collect()
        b = _window_cumsum(df, "v", "s", "k", "cum").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestSmallInputFastPath:
    """r15 (VERDICT r14 #1): inputs at or below small_threshold skip
    boundary collection and run the plain window — no cache, no
    two-branch scan, no collect beyond the one count job."""

    def test_default_threshold_takes_window_path(self, spark):
        df = _mkdf(spark, 3000, 2)
        out = distributed_cumsum(df, "v", "s", "k", "cum", keep_bucket="b")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" not in plan  # no cache on the fast path
        rows = out.collect()
        assert {r["b"] for r in rows} == {0}  # degenerate single bucket
        want = {
            (r["s"], r["k"]): r["cum"]
            for r in _window_cumsum(df, "v", "s", "k", "cum").collect()
        }
        assert {(r["s"], r["k"]): r["cum"] for r in rows} == want

    def test_threshold_boundary_is_inclusive(self, spark):
        df = _mkdf(spark, 100, 1)
        out = distributed_cumsum(
            df, "v", "s", "k", "cum", n_buckets=4, sample_target=50,
            small_threshold=100, keep_bucket="b",
        )
        assert {r["b"] for r in out.collect()} == {0}
        out2 = distributed_cumsum(
            df, "v", "s", "k", "cum", n_buckets=4, sample_target=50,
            small_threshold=99, keep_bucket="b",
        )
        assert len({r["b"] for r in out2.collect()}) > 1

    def test_no_cache_attached_on_fast_path(self, spark):
        from qurio_spark.operators.cachectl import cached_frames

        out = distributed_cumsum(_mkdf(spark, 50, 1), "v", "s", "k", "cum")
        assert cached_frames(out) == []


class TestCumsumCacheLifetime:
    """r15 (VERDICT r14 #3/#6): the bucketed path persists its bucketed
    frame once (both branches share it) and hands the cache back for
    deterministic release."""

    def test_bucketed_path_attaches_and_releases(self, spark):
        from qurio_spark.operators.cachectl import cached_frames, release_caches

        df = _mkdf(spark, 2000, 2)
        out = distributed_cumsum(
            df, "v", "s", "k", "cum", n_buckets=6, sample_target=150,
            small_threshold=0,
        )
        frames = cached_frames(out)
        assert len(frames) == 1
        out.count()  # materialize (fills the cache)
        assert frames[0].storageLevel.useMemory
        assert release_caches(out) == 1
        assert not frames[0].storageLevel.useMemory  # unpersisted
        assert release_caches(out) == 0  # idempotent

    def test_udf_counter_materializes_once(self, spark):
        """VERDICT r14 #6: with an expensive (Python UDF) value
        expression, the bucketed path's auto-persist means the UDF
        runs inside the ONE cached materialization — the live plan
        (outside the InMemoryRelation subtree) carries no Python
        stage, so neither the running-sum nor the totals branch
        re-evaluates the counter."""
        import re

        from pyspark.sql.functions import pandas_udf

        from qurio_spark.operators.cachectl import release_caches

        _pycount = pandas_udf(
            lambda s: s.str.len().astype("int64"), "long"
        )

        df = _mkdf(spark, 2000, 2).withColumn("v2", _pycount("k"))
        out = distributed_cumsum(
            df, "v2", "s", "k", "cum", n_buckets=6, sample_target=150,
            small_threshold=0,
        )
        out.collect()
        from tools.plan_audit import split_cached_blocks, strip_initial_plans

        plan = strip_initial_plans(
            out._jdf.queryExecution().executedPlan().toString()
        )
        live, blocks = split_cached_blocks(plan)
        imr = [l for _, body in blocks for l in body]
        pyth = re.compile(r"ArrowEvalPython|BatchEvalPython|MapInPandas")
        assert not any(pyth.search(l) for l in live), plan
        assert any(pyth.search(l) for l in imr), plan
        release_caches(out)

    def test_persist_false_skips_cache(self, spark):
        from qurio_spark.operators.cachectl import cached_frames

        out = distributed_cumsum(
            _mkdf(spark, 2000, 2), "v", "s", "k", "cum", n_buckets=6,
            sample_target=150, small_threshold=0, persist=False,
        )
        assert cached_frames(out) == []
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" not in plan


class TestCompositeKeys:
    def test_matches_window_on_composite_desc_key(self, spark):
        """curate's shape: order by (quality desc, id asc), expressed
        as an all-ascending composite key with quality negated."""
        df = _mkdf(spark, 2000, 3).withColumn(
            "q", (F.pmod(F.xxhash64("k"), F.lit(50)) / 10.0)
        ).withColumn("negq", -F.col("q"))
        got = {
            (r["s"], r["k"]): r["cum"]
            for r in distributed_cumsum(
                df, "v", "s", ["negq", "k"], "cum",
                n_buckets=8, sample_target=150, hash_col="k",
                small_threshold=0,
            ).collect()
        }
        w = (
            Window.partitionBy("s")
            .orderBy(F.desc("q"), F.asc("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            (r["s"], r["k"]): r["cum"]
            for r in df.withColumn("cum", F.sum("v").over(w)).collect()
        }
        assert got == want

    def test_distributed_rank_matches_row_number(self, spark):
        from qurio_spark.operators.prefix import distributed_rank

        df = _mkdf(spark, 1500, 2)
        got = {
            (r["s"], r["k"]): r["rk"]
            for r in distributed_rank(
                df, "s", ["v", "k"], "rk", n_buckets=6, sample_target=100,
                hash_col="k", small_threshold=0,
            ).collect()
        }
        w = Window.partitionBy("s").orderBy(F.asc("v"), F.asc("k"))
        want = {
            (r["s"], r["k"]): r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want


class TestPrefixSumAlgebra:
    """Pure-Python fuzz of the module's central claim: the two-pass
    reconstruction equals the direct cumsum for ANY boundary set —
    unsorted, duplicated, out of range, adversarially skewed — because
    bucket(r) = |{b <= r}| is monotone in the key order and bucket
    ranges can never interleave."""

    from hypothesis import given, settings, strategies as st

    ROWS = st.lists(
        st.tuples(
            st.integers(0, 3),          # part
            st.integers(-50, 50),       # order key (deduped per part)
            st.integers(-100, 100),     # value (negatives allowed)
        ),
        max_size=60,
    )
    BOUNDS = st.lists(st.integers(-80, 80), max_size=12)

    @given(ROWS, BOUNDS)
    @settings(max_examples=300, deadline=None)
    def test_any_boundary_set_reconstructs_exactly(self, rows, bounds):
        # unique key within part (the operator's contract)
        seen = {}
        for p, k, v in rows:
            seen.setdefault((p, k), v)
        rows = [(p, k, v) for (p, k), v in seen.items()]

        def direct(rows):
            out = {}
            for p in {r[0] for r in rows}:
                run = 0
                for pp, k, v in sorted(
                    (r for r in rows if r[0] == p), key=lambda r: r[1]
                ):
                    run += v
                    out[(p, k)] = run
            return out

        def bucket(k):
            return sum(1 for b in bounds if b <= k)

        # two-pass: per-(part, bucket) running sums + offsets
        got = {}
        parts = {r[0] for r in rows}
        for p in parts:
            mine = sorted((r for r in rows if r[0] == p), key=lambda r: r[1])
            totals = {}
            for _, k, v in mine:
                totals[bucket(k)] = totals.get(bucket(k), 0) + v
            offs = {
                b: sum(t for bb, t in totals.items() if bb < b)
                for b in totals
            }
            run = {}
            for _, k, v in mine:
                b = bucket(k)
                run[b] = run.get(b, 0) + v
                got[(p, k)] = run[b] + offs[b]
        assert got == direct(rows)


class TestBoundaries:
    def test_deterministic(self, spark):
        df = _mkdf(spark, 5000, 3)
        a = order_key_boundaries(df, "k", 16, sample_target=300)
        b = order_key_boundaries(df, "k", 16, sample_target=300)
        assert a == b and len(a) >= 8
        assert a == sorted(a)

    def test_small_input_no_bounds(self, spark):
        df = _mkdf(spark, 1, 1)
        assert order_key_boundaries(df, "k", 8) == []

    def test_single_bucket_no_bounds(self, spark):
        df = _mkdf(spark, 100, 1)
        assert order_key_boundaries(df, "k", 1) == []

    def test_count_df_upper_bound_equivalent(self, spark):
        """r15: sizing the sample from a CHEAP count_df (row count
        upper-bounds sample_df's) must keep the cumsum bit-identical —
        boundary choice never affects output — and the small-input
        decision must still fire from the hint alone."""
        df = _mkdf(spark, 3000, 2)
        # over-counting frame (2x the rows): thresh shrinks, sample
        # shrinks, boundaries differ — output must not
        big = _mkdf(spark, 6000, 2)
        got = {
            (r["s"], r["k"]): r["cum"]
            for r in distributed_cumsum(
                df, "v", "s", "k", "cum", n_buckets=8, sample_target=200,
                small_threshold=0, count_df=big,
            ).collect()
        }
        want = {
            (r["s"], r["k"]): r["cum"]
            for r in _window_cumsum(df, "v", "s", "k", "cum").collect()
        }
        assert got == want
        # small decision from the hint: count_df under the threshold
        # takes the degenerate window path (no boundaries collected)
        assert (
            order_key_boundaries(
                df, "k", 8, small_threshold=5000, count_df=df
            )
            == []
        )
