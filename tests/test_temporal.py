"""Temporal join operators (operators/temporal.py): as-of join and
binned range join, verified against naive join+filter references on
data that exercises the edge cases (exact-timestamp ties, keys with no
candidates, window boundary hits, multi-bin spans)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from qurio_spark.operators.temporal import asof_join, range_join_binned


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            # (key, t, tag)
            ("a", 10, "l1"),   # matches r@10 (inclusive)
            ("a", 9, "l2"),    # matches r@5
            ("a", 4, "l3"),    # no prior right
            ("b", 100, "l4"),  # key with no right rows at all
            ("a", 20, "l5"),   # matches r@15
        ],
        "key string, t long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("a", 5, "r5"),
            ("a", 10, "r10"),
            ("a", 15, "r15"),
            ("c", 1, "rc"),    # right-only key never surfaces
        ],
        "key string, t long, val string",
    )
    return left, right


def test_asof_backward(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on=["key"], left_ts="t", right_ts="t",
        right_payload=["val"], direction="backward",
    )
    got = {r["tag"]: (r["val"], r["matched_ts"]) for r in out.collect()}
    assert got == {
        "l1": ("r10", 10),   # inclusive at equal ts
        "l2": ("r5", 5),
        "l3": (None, None),  # left-join semantics
        "l4": (None, None),
        "l5": ("r15", 15),
    }
    assert out.count() == left.count()  # never drops/multiplies left rows


def test_asof_forward(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on=["key"], left_ts="t", right_ts="t",
        right_payload=["val"], direction="forward",
    )
    got = {r["tag"]: r["val"] for r in out.collect()}
    assert got == {
        "l1": "r10",   # inclusive: earliest right >= t
        "l2": "r10",
        "l3": "r5",
        "l4": None,
        "l5": None,    # nothing at/after 20
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_asof_matches_naive_reference(spark, seed):
    """Dense pseudo-random case vs the quadratic reference."""
    import random

    rnd = random.Random(seed)
    lrows = [(f"k{rnd.randrange(4)}", rnd.randrange(100), i) for i in range(60)]
    rrows = {(f"k{rnd.randrange(4)}", rnd.randrange(100)) for _ in range(40)}
    rrows = [(k, t, f"v{k}@{t}") for k, t in sorted(rrows)]
    left = spark.createDataFrame(lrows, "key string, t long, lid long")
    right = spark.createDataFrame(rrows, "key string, t long, val string")

    out = asof_join(left, right, on=["key"], left_ts="t", right_ts="t",
                    right_payload=["val"])
    got = {r["lid"]: r["val"] for r in out.collect()}

    by_key = {}
    for k, t, v in rrows:
        by_key.setdefault(k, []).append((t, v))
    for k, t, lid in lrows:
        cands = [(rt, v) for rt, v in by_key.get(k, []) if rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, f"lid={lid} key={k} t={t}"


def test_range_join_binned_boundaries(spark):
    left = spark.createDataFrame([Row(lid=1, t=100.0)])
    right = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate([39, 40, 100, 160, 161])],
        "rid long, t double",
    )
    out = range_join_binned(left, right, "t", "t", lo=-60.0, hi=60.0)
    # inclusive at both edges: 40, 100, 160; 39 and 161 out of range
    assert sorted(r["rid"] for r in out.collect()) == [1, 2, 3]
    # no duplicate pairs despite the left row spanning two bins
    assert out.count() == 3


@pytest.mark.parametrize("seed", [11, 37])
def test_range_join_binned_matches_naive(spark, seed):
    import random

    rnd = random.Random(seed)
    lrows = [(i, float(rnd.randrange(0, 500))) for i in range(50)]
    rrows = [(i, float(rnd.randrange(0, 500))) for i in range(70)]
    left = spark.createDataFrame(lrows, "lid long, t double")
    right = spark.createDataFrame(rrows, "rid long, t double")

    for lo, hi, bw in [(-25.0, 25.0, None), (0.0, 40.0, 13.0), (-7.0, -2.0, None)]:
        out = range_join_binned(left, right, "t", "t", lo=lo, hi=hi, bin_width=bw)
        got = sorted((r["lid"], r["rid"]) for r in out.collect())
        want = sorted(
            (lid, rid)
            for lid, lt in lrows
            for rid, rt in rrows
            if lt + lo <= rt <= lt + hi
        )
        assert got == want, f"window=({lo},{hi}) bin={bw}"


def test_range_join_binned_equi_keys(spark):
    left = spark.createDataFrame(
        [("u1", 1, 100.0), ("u2", 2, 100.0)], "user string, lid long, t double"
    )
    right = spark.createDataFrame(
        [("u1", 10, 110.0), ("u2", 20, 110.0), ("u1", 11, 500.0)],
        "user string, rid long, t double",
    )
    out = range_join_binned(
        left, right, "t", "t", lo=-60.0, hi=60.0, on=["user"]
    )
    assert sorted((r["user"], r["lid"], r["rid"]) for r in out.collect()) == [
        ("u1", 1, 10),
        ("u2", 2, 20),
    ]


def test_asof_single_shuffle_plan(spark, sides):
    """The scale claim, frozen: the as-of join itself is ONE hash
    shuffle (the union'd window) — no join node at all."""
    from tools.plan_audit import audit

    left, right = sides
    out = asof_join(left, right, on=["key"], left_ts="t", right_ts="t",
                    right_payload=["val"])
    a = audit(out)
    assert a["shuffles"] <= 1, a["plan"]
    assert a["smj"] == a["bhj"] == a["bnlj"] == 0, a["plan"]


def test_asof_hot_key_correct(spark):
    """One key holding ~90% of both sides (window-skew class): results
    must still match the quadratic reference — the union+window shape
    degrades in latency under skew, never in correctness."""
    import random

    rnd = random.Random(5)
    lrows = [("hot" if i % 10 else f"cold{i}", rnd.randrange(1000), i)
             for i in range(200)]
    rrows = sorted({("hot" if i % 10 else f"cold{i}", rnd.randrange(1000))
                    for i in range(150)})
    rrows = [(k, t, f"{k}@{t}") for k, t in rrows]
    left = spark.createDataFrame(lrows, "key string, t long, lid long")
    right = spark.createDataFrame(rrows, "key string, t long, val string")

    out = asof_join(left, right, on=["key"], left_ts="t", right_ts="t",
                    right_payload=["val"])
    got = {r["lid"]: r["val"] for r in out.collect()}
    by_key = {}
    for k, t, v in rrows:
        by_key.setdefault(k, []).append((t, v))
    for k, t, lid in lrows:
        cands = [(rt, v) for rt, v in by_key.get(k, []) if rt <= t]
        assert got[lid] == (max(cands)[1] if cands else None)


def test_asof_payload_collision_raises(spark, sides):
    left, right = sides
    bad_right = right.withColumnRenamed("val", "tag")  # collides with left.tag
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad_right, on=["key"], left_ts="t", right_ts="t",
                  right_payload=["tag"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["key"], left_ts="t", right_ts="t",
                  right_payload=["val"], matched_ts_col="tag")


def test_range_join_hot_bin_correct(spark):
    """90% of right rows share one timestamp (a hot time slice — the
    AQE-splittable skew case): pair results must still match the
    quadratic reference exactly."""
    lrows = [(i, float(100 + i)) for i in range(20)]
    rrows = [(i, 110.0 if i % 10 else float(i)) for i in range(100)]
    left = spark.createDataFrame(lrows, "lid long, t double")
    right = spark.createDataFrame(rrows, "rid long, t double")
    out = range_join_binned(left, right, "t", "t", lo=-15.0, hi=15.0)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted(
        (lid, rid)
        for lid, lt in lrows
        for rid, rt in rrows
        if lt - 15.0 <= rt <= lt + 15.0
    )
    assert got == want


@pytest.mark.parametrize("seed", [11, 37])
def test_range_join_binned_left_matches_naive(spark, seed):
    """how='left' (join-back on left_key): standard left-join semantics
    — every true pair once, unmatched left rows once with NULL right
    columns — verified against the naive inequality left join."""
    import random

    rnd = random.Random(seed)
    lrows = [(i, float(rnd.randrange(0, 500))) for i in range(40)]
    rrows = [(i, float(rnd.randrange(0, 500))) for i in range(30)]
    left = spark.createDataFrame(lrows, "lid long, t double")
    right = spark.createDataFrame(rrows, "rid long, t double")

    for lo, hi in [(-25.0, 25.0), (-3.0, -1.0)]:
        out = range_join_binned(
            left, right, "t", "t", lo=lo, hi=hi, how="left", left_key=["lid"]
        )
        got = sorted(
            (r["lid"], r["rid"]) for r in out.collect()
        )
        matched = {
            (lid, rid)
            for lid, lt in lrows
            for rid, rt in rrows
            if lt + lo <= rt <= lt + hi
        }
        matched_lids = {lid for lid, _ in matched}
        want = sorted(
            list(matched)
            + [(lid, None) for lid, _ in lrows if lid not in matched_lids]
        )
        assert got == want, f"window=({lo},{hi})"
        # left columns all preserved
        assert set(out.columns) >= {"lid", "t", "rid"}


def test_range_join_binned_left_requires_key(spark):
    left = spark.createDataFrame([Row(lid=1, t=100.0)])
    right = spark.createDataFrame([Row(rid=1, t=100.0)])
    with pytest.raises(ValueError, match="left_key"):
        range_join_binned(left, right, "t", "t", -1.0, 1.0, how="left")


def test_range_join_binned_left_equi_keys_and_collision(spark):
    """Equi-keyed left form, with a clashing right time column getting
    the _r suffix and NULLs for the keyless user."""
    left = spark.createDataFrame(
        [("u1", 1, 100.0), ("u3", 3, 100.0)], "user string, lid long, t double"
    )
    right = spark.createDataFrame(
        [("u1", 10, 110.0), ("u1", 11, 500.0)],
        "user string, rid long, t double",
    )
    out = range_join_binned(
        left, right, "t", "t", lo=-60.0, hi=60.0, on=["user"],
        how="left", left_key=["lid"],
    )
    rows = {r["lid"]: (r["rid"], r["t_r"]) for r in out.collect()}
    assert rows == {1: (10, 110.0), 3: (None, None)}


class TestGapFillLocf:
    def test_gaps_filled_with_locf_and_zero_counts(self, spark):
        from datetime import datetime

        from qurio_spark.operators.temporal import gap_fill_locf

        ev = spark.createDataFrame(
            [
                ("a", datetime(2026, 1, 1, 0, 10), 1.0),
                ("a", datetime(2026, 1, 1, 0, 50), 2.0),
                # hours 1-2 empty for 'a'
                ("a", datetime(2026, 1, 1, 3, 5), 7.0),
                # 'b' starts late: hours 0-2 have no observation
                ("b", datetime(2026, 1, 1, 3, 30), 5.0),
            ],
            "k string, ts timestamp, v double",
        )
        out = gap_fill_locf(ev, "ts", ["k"], "v", unit="hour")
        got = {
            (r["k"], r["bucket"].hour): (r["n"], r["v_filled"])
            for r in out.collect()
        }
        assert len(got) == 8  # 2 keys x 4 hours: the dense grid
        assert got[("a", 0)] == (2, 3.0)
        assert got[("a", 1)] == (0, 3.0)  # LOCF carries hour 0's sum
        assert got[("a", 2)] == (0, 3.0)
        assert got[("a", 3)] == (1, 7.0)
        assert got[("b", 0)] == (0, None)  # before first observation
        assert got[("b", 3)] == (1, 5.0)
