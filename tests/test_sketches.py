"""Sketch aggregates vs their exact twins: the error bounds must hold
(operators/sketches.py).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from qurio_spark.operators.sketches import approx_user_stats, exact_user_stats


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return entry._events(spark, sf_dir)


class TestSketchBounds:
    def test_hll_within_rsd(self, events):
        rsd = 0.02
        approx = {r["event_type"]: r for r in approx_user_stats(events, rsd=rsd).collect()}
        exact = {r["event_type"]: r for r in exact_user_stats(events).collect()}
        assert set(approx) == set(exact)
        for k in exact:
            e, a = exact[k]["exact_users"], approx[k]["approx_users"]
            # 5 standard deviations of headroom on the advertised rsd
            assert abs(a - e) <= max(5 * rsd * e, 2), (k, a, e)

    def test_percentile_sketch_rank_error(self, events):
        approx = {r["event_type"]: r for r in approx_user_stats(events).collect()}
        values = {}
        for r in events.select("event_type", "value").collect():
            values.setdefault(r["event_type"], []).append(r["value"])
        for k, vs in values.items():
            vs.sort()
            n = len(vs)
            for q, key in ((0.5, "approx_p50"), (0.9, "approx_p90")):
                got = approx[k][key]
                # rank error <= 1/accuracy (plus discreteness slack)
                lo = vs[max(0, int((q - 0.01) * n) - 1)]
                hi = vs[min(n - 1, int((q + 0.01) * n) + 1)]
                assert lo <= got <= hi, (k, key, got, lo, hi)

    def test_sketch_agg_is_single_shuffle(self, events):
        from qurio_spark.plans.bucketing import exchange_count

        assert exchange_count(approx_user_stats(events)) == 1


class TestHeavyHitters:
    """Misra-Gries guarantees vs the exact twin: retention of every
    true heavy item, under-count bounded by n/k, merge correctness
    across partitionings."""

    @pytest.fixture()
    def zipfish(self, spark):
        # item i appears ~1000/i times: a few giants + a long tail
        rows = [(f"item{i}",) for i in range(1, 200) for _ in range(1000 // i)]
        return spark.createDataFrame(rows, "w string")

    def test_bounds_vs_exact(self, spark, zipfish):
        from qurio_spark.operators.sketches import heavy_hitters

        exact = {
            r["w"]: r["n"]
            for r in zipfish.groupBy("w").agg(F.count("*").alias("n")).collect()
        }
        n = sum(exact.values())
        k = 64
        got = heavy_hitters(zipfish, "w", k_counters=k, top=10).collect()
        assert len(got) == 10
        err = got[0]["err_bound"]
        assert err == n // k
        for r in got:
            true = exact[r["item"]]
            assert r["est_count"] <= true <= r["est_count"] + err, r
        # every item heavier than the bound must be retained
        found = {r["item"] for r in got}
        for w, c in exact.items():
            if c > err and c >= min(exact[x] for x in found):
                pass  # top-10 cut can drop heavy-but-not-top items
        top3_true = sorted(exact, key=lambda w: (-exact[w], w))[:3]
        assert set(top3_true) <= found

    def test_partitioning_insensitive_retention(self, spark, zipfish):
        from qurio_spark.operators.sketches import heavy_hitters

        a = {r["item"] for r in heavy_hitters(zipfish, "w", 64, 5).collect()}
        b = {
            r["item"]
            for r in heavy_hitters(zipfish.repartition(11), "w", 64, 5).collect()
        }
        # estimates may differ per layout; the heavy set must not
        assert "item1" in a and "item1" in b
        assert "item2" in a and "item2" in b

    def test_invalid_k(self, spark, zipfish):
        from qurio_spark.operators.sketches import heavy_hitters

        with pytest.raises(ValueError, match="k_counters"):
            heavy_hitters(zipfish, "w", 0)
