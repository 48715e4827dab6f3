"""Sketch aggregates vs their exact twins: the error bounds must hold
(operators/sketches.py).
"""

import pytest

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
