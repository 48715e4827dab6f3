"""Unit tests: fuzzy symdelete join, dq_profile, outlier_events.

The fuzzy-join test is the losslessness proof in executable form: the
SymSpell-blocked result must equal the brute-force quadratic scan for
every edit class (equal, deletion, insertion, substitution) plus true
negatives at distance 2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.fuzzy import fuzzy_join, symdelete_keys
from qurio_spark.operators.quality import dq_profile, outlier_events


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spork", "spark", "sprk", "sparks", "shark", "stark",
    "spar", "park", "sparky", "quark", "snark", "sparc", "spank",
    "space", "spade", "", "a", "b", "ab", "ba", "abc",
]


class TestFuzzyJoin:
    def test_symdelete_keys_shape(self, spark):
        row = (
            spark.range(1)
            .select(symdelete_keys(F.lit("abc")).alias("k"))
            .first()
        )
        assert row["k"] == ["abc", "bc", "ac", "ab"]

    def test_empty_string_keys(self, spark):
        row = (
            spark.range(1)
            .select(symdelete_keys(F.lit("")).alias("k"))
            .first()
        )
        assert row["k"] == [""]

    def test_lossless_vs_bruteforce(self, spark):
        left = spark.createDataFrame(
            [(i, w) for i, w in enumerate(WORDS)], "lid int, ls string"
        )
        right = spark.createDataFrame(
            [(100 + i, w) for i, w in enumerate(WORDS)], "rid int, rs string"
        )
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_join(left, right, "lid", "ls", "rid", "rs").collect()
        }
        want = {
            (i, 100 + j)
            for i, a in enumerate(WORDS)
            for j, b in enumerate(WORDS)
            if _lev(a, b) <= 1
        }
        assert got == want

    def test_dist_column_exact(self, spark):
        left = spark.createDataFrame([(1, "spark")], "lid int, ls string")
        right = spark.createDataFrame(
            [(2, "spark"), (3, "spork"), (4, "sprk")], "rid int, rs string"
        )
        rows = {
            r["rid"]: r["dist"]
            for r in fuzzy_join(left, right, "lid", "ls", "rid", "rs").collect()
        }
        assert rows == {2: 0, 3: 1, 4: 1}

    def test_k3_out_of_range(self, spark):
        df = spark.createDataFrame([(1, "x")], "i int, s string")
        with pytest.raises(ValueError):
            fuzzy_join(df, df, "i", "s", "i", "s", max_dist=3)

    def test_long_string_errors_by_default(self, spark):
        # One dirty 5,000-char field would be ~12.5M symdelete keys at
        # k=2; the guard must fail fast, not materialize them.
        left = spark.createDataFrame([(1, "x" * 5000)], "lid int, ls string")
        right = spark.createDataFrame([(2, "ok")], "rid int, rs string")
        with pytest.raises(Exception, match="max_len"):
            fuzzy_join(
                left, right, "lid", "ls", "rid", "rs", max_dist=2
            ).collect()

    def test_long_string_drop_policy(self, spark):
        left = spark.createDataFrame(
            [(1, "x" * 5000), (2, "spark")], "lid int, ls string"
        )
        right = spark.createDataFrame([(3, "spork")], "rid int, rs string")
        rows = fuzzy_join(
            left, right, "lid", "ls", "rid", "rs",
            max_dist=1, long_strings="drop",
        ).collect()
        assert [(r["lid"], r["rid"]) for r in rows] == [(2, 3)]

    def test_null_strings_pass_the_guard(self, spark):
        # NULL strings must NOT trip the overlong error (their key
        # arrays explode to nothing — the pre-guard behavior)
        left = spark.createDataFrame(
            [(1, None), (2, "spark")], "lid int, ls string"
        )
        right = spark.createDataFrame(
            [(3, "spork"), (4, None)], "rid int, rs string"
        )
        rows = fuzzy_join(left, right, "lid", "ls", "rid", "rs").collect()
        assert [(r["lid"], r["rid"]) for r in rows] == [(2, 3)]

    def test_cross_collision_names_suffixed(self, spark):
        # right_id colliding with LEFT_STR (not just its own twin)
        # must also come back suffixed — no duplicate output names
        left = spark.createDataFrame([(1, "spark")], "id int, name string")
        right = spark.createDataFrame(
            [("spork", "x")], "name string, label string"
        )
        out = fuzzy_join(left, right, "id", "name", "name", "label")
        assert out.columns == ["id", "name", "name_r", "label", "dist"]
        assert len(out.columns) == len(set(out.columns))

    def test_long_strings_bad_policy(self, spark):
        df = spark.createDataFrame([(1, "x")], "i int, s string")
        with pytest.raises(ValueError, match="long_strings"):
            fuzzy_join(df, df, "i", "s", "i", "s", long_strings="ignore")

    def test_dist_is_reserved_on_left(self, spark):
        df = spark.createDataFrame([(1, "x")], "dist int, s string")
        with pytest.raises(ValueError, match="reserved"):
            fuzzy_join(df, df, "dist", "s", "dist", "s")

    def test_right_named_dist_gets_suffixed(self, spark):
        left = spark.createDataFrame([(1, "spark")], "id int, name string")
        right = spark.createDataFrame(
            [("spork", "x")], "name string, dist string"
        )
        out = fuzzy_join(left, right, "id", "name", "name", "dist")
        assert out.columns == ["id", "name", "name_r", "dist_r", "dist"]
        assert len(out.columns) == len(set(out.columns))

    def test_suffix_chain_until_unique(self, spark):
        # right_id collides with left_id AND the suffixed form collides
        # with left_str — the suffix must chain, never duplicate
        left = spark.createDataFrame([(1, "spark")], "a int, a_r string")
        right = spark.createDataFrame([(2, "spork")], "a int, b string")
        out = fuzzy_join(left, right, "a", "a_r", "a", "b")
        assert out.columns == ["a", "a_r", "a_r_r", "b", "dist"]
        assert len(out.columns) == len(set(out.columns))

    def test_self_join_same_column_names(self, spark):
        # Joining a frame to itself (identical column names on both
        # sides) must not raise an ambiguous-reference error; the
        # right side's colliding names come back suffixed "_r".
        df = spark.createDataFrame(
            [(1, "spark"), (2, "spork"), (3, "zzz")], "i int, s string"
        )
        out = fuzzy_join(df, df, "i", "s", "i", "s", max_dist=1)
        assert out.columns == ["i", "s", "i_r", "s_r", "dist"]
        pairs = {(r["i"], r["i_r"]) for r in out.collect()}
        assert pairs == {(1, 1), (2, 2), (3, 3), (1, 2), (2, 1)}


class TestDqProfile:
    def test_metrics(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", -1.0), (3, None, 5.0), (3, "b", 7.0)],
            "k int, s string, v double",
        )
        out = {
            (r["metric"], r["column"]): r["value"]
            for r in dq_profile(
                df,
                completeness=["s"],
                distinctness=["s"],
                bounds=["v"],
                compliance={"v_positive": F.col("v") > 0},
                unique_key="k",
            ).collect()
        }
        assert out[("row_count", "*")] == 4.0
        assert out[("completeness", "s")] == 0.75
        assert out[("distinct_count", "s")] == 2.0
        assert out[("min", "v")] == -1.0
        assert out[("max", "v")] == 10.0
        assert out[("compliance", "v_positive")] == 0.75
        assert out[("uniqueness", "k")] == 0.75

    def test_quote_in_compliance_name(self, spark):
        # Metric/check names are typed literals, not spliced SQL — a
        # single quote in a check name must survive verbatim.
        df = spark.createDataFrame([(1, 2.0), (2, -1.0)], "k int, v double")
        out = {
            (r["metric"], r["column"]): r["value"]
            for r in dq_profile(
                df, compliance={"isn't negative": F.col("v") >= 0}
            ).collect()
        }
        assert out[("compliance", "isn't negative")] == 0.5

    def test_single_job_single_scan(self, spark):
        df = spark.createDataFrame([(1, 2.0)], "k int, v double")
        plan = dq_profile(
            df, completeness=["v"], bounds=["v"], unique_key="k"
        )._jdf.queryExecution().optimizedPlan().toString()
        # one logical scan feeds the whole profile
        assert plan.count("LogicalRDD") == 1

    def test_empty_frame(self, spark):
        df = spark.createDataFrame([], "k int, v double")
        out = {
            (r["metric"], r["column"]): r["value"]
            for r in dq_profile(df, bounds=["v"]).collect()
        }
        assert out[("row_count", "*")] == 0.0
        assert out[("min", "v")] is None


class TestOutlierEvents:
    def test_integer_rule(self, spark):
        # user 1: 20 events of 1.00 plus one 10.00 -> the 10.00 has
        # cents*n = 1000*21 > 3*sum = 3*3000 -> flagged
        rows = [(i, 1, 1.0) for i in range(20)] + [(99, 1, 10.0)]
        # user 2: below min_group, extreme value NOT flagged
        rows += [(200, 2, 1.0), (201, 2, 100.0)]
        df = spark.createDataFrame(rows, "event_id int, user_id int, value double")
        out = outlier_events(df, factor=3, min_group=20).collect()
        assert [(r["event_id"], r["value_cents"], r["n_group"]) for r in out] == [
            (99, 1000, 21)
        ]

    def test_boundary_not_flagged(self, spark):
        # at/below 3x the mean is NOT an outlier (strict >)
        df = spark.createDataFrame(
            [(i, 1, 1.0) for i in range(24)] + [(24, 1, 3.125)],
            "event_id int, user_id int, value double",
        )
        # cents: 24*100 + 313 (floor(312.5+0.5)=313) = 2713
        # test: 313 * 25 = 7825 <= 3 * 2713 = 8139 -> not flagged
        assert outlier_events(df, factor=3, min_group=20).count() == 0

    def test_null_values_excluded_from_n_group(self, spark):
        # r13 contract: NULL values count toward NEITHER the sum NOR
        # n_group — the implied mean is over observed values only.
        # 20 observed 1.0s + one 5.0 spike + 30 NULLs: the spike is
        # 5x the observed mean (flagged); under the old count(*) rule
        # n_group=51 would both pass min_group trivially and deflate
        # nothing — here the NULLs must be invisible.
        rows = (
            [(i, 1, 1.0) for i in range(20)]
            + [(20, 1, 5.0)]
            + [(100 + i, 1, None) for i in range(30)]
        )
        df = spark.createDataFrame(
            rows, "event_id int, user_id int, value double"
        )
        out = outlier_events(df, factor=3, min_group=20).collect()
        assert [(r["event_id"], r["n_group"]) for r in out] == [(20, 21)]
        # and a group whose OBSERVED count is below min_group is out,
        # even though its raw row count clears the bar
        rows2 = [(i, 2, 1.0) for i in range(10)] + [
            (200 + i, 2, None) for i in range(15)
        ]
        df2 = spark.createDataFrame(
            rows2 + [(999, 2, 99.0)], "event_id int, user_id int, value double"
        )
        assert outlier_events(df2, factor=3, min_group=20).count() == 0

    def test_null_group_key_forms_a_group(self, spark):
        # The r15 groupBy+join-back must keep the window form's NULL
        # semantics: partitionBy/groupBy collect NULL keys into ONE
        # group, so the join back must be null-safe — a bare equi-join
        # would silently drop every NULL-keyed row.
        rows = [(i, None, 1.0) for i in range(20)] + [(99, None, 10.0)]
        rows += [(200 + i, 7, 1.0) for i in range(20)] + [(299, 7, 10.0)]
        df = spark.createDataFrame(
            rows, "event_id int, user_id int, value double"
        )
        out = outlier_events(df, factor=3, min_group=20).collect()
        got = sorted((r["event_id"], r["user_id"], r["n_group"]) for r in out)
        assert got == [(99, None, 21), (299, 7, 21)]


class TestFuzzyJoinRandomized:
    def test_dense_random_space_equals_bruteforce(self, spark):
        """Seeded-random dense space (3-letter alphabet, lengths 0-5):
        hundreds of strings where distance-1 pairs are COMMON across
        every edit class, verified in one Spark job against the exact
        quadratic reference."""
        import random

        rng = random.Random(0xF0221)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
            for _ in range(250)
        ]
        left = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "lid int, ls string"
        )
        right = spark.createDataFrame(
            [(1000 + i, w) for i, w in enumerate(words)], "rid int, rs string"
        )
        got = {
            (r["lid"], r["rid"], r["dist"])
            for r in fuzzy_join(left, right, "lid", "ls", "rid", "rs").collect()
        }
        want = {
            (i, 1000 + j, _lev(a, b))
            for i, a in enumerate(words)
            for j, b in enumerate(words)
            if _lev(a, b) <= 1
        }
        assert len(want) > 3000, "dense space sanity"
        assert got == want


class TestDqProfileApprox:
    def test_approx_distinct_path(self, spark):
        """exact_distinct=False swaps countDistinct for HLL: no expand
        in the plan, values within HLL tolerance."""
        df = spark.range(10000).selectExpr("id AS k", "id % 997 AS g")
        out = {
            (r["metric"], r["column"]): r["value"]
            for r in dq_profile(
                df, distinctness=["g"], unique_key="k", exact_distinct=False
            ).collect()
        }
        assert abs(out[("distinct_count", "g")] - 997) / 997 < 0.05
        assert abs(out[("uniqueness", "k")] - 1.0) < 0.05
        plan = dq_profile(
            df, distinctness=["g"], unique_key="k", exact_distinct=False
        )._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan


class TestSymdeleteKeysReference:
    def test_keys_match_python_reference_incl_unicode(self, spark):
        """symdelete_keys (codegen substring arithmetic) vs Python
        slicing over 300 seeded-random strings including multibyte
        codepoints — Spark substring is codepoint-based, so the two
        must agree exactly."""
        import random

        rng = random.Random(0xD11)
        alpha = "abcé漢🙂0"
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
            for _ in range(300)
        ]
        df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i int, s string")
        got = {
            r["i"]: r["k"]
            for r in df.select("i", symdelete_keys(F.col("s")).alias("k")).collect()
        }
        for i, w in enumerate(words):
            want = [w] + [w[:j] + w[j + 1 :] for j in range(len(w))] if w else [w]
            assert got[i] == want, (w, got[i], want)


class TestFuzzyJoinK2:
    def test_keys2_shape(self, spark):
        row = (
            spark.range(1)
            .select(
                __import__("qurio_spark.operators.fuzzy", fromlist=["x"])
                .symdelete_keys2(F.lit("abc"))
                .alias("k")
            )
            .first()
        )
        assert row["k"] == ["abc", "bc", "ac", "ab", "c", "b", "a"]

    def test_short_strings(self, spark):
        from qurio_spark.operators.fuzzy import symdelete_keys2

        assert spark.range(1).select(
            symdelete_keys2(F.lit("a")).alias("k")
        ).first()["k"] == ["a", ""]
        assert spark.range(1).select(
            symdelete_keys2(F.lit("")).alias("k")
        ).first()["k"] == [""]

    def test_dense_random_space_equals_bruteforce_k2(self, spark):
        """150 strings over a 2-letter alphabet (lengths 0-6): >9000
        true distance<=2 pairs spanning every double-edit class,
        verified against the exact quadratic reference."""
        import random

        rng = random.Random(0xBEEF)
        words = [
            "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
            for _ in range(150)
        ]
        left = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "lid int, ls string"
        )
        right = spark.createDataFrame(
            [(900 + i, w) for i, w in enumerate(words)], "rid int, rs string"
        )
        got = {
            (r["lid"], r["rid"], r["dist"])
            for r in fuzzy_join(
                left, right, "lid", "ls", "rid", "rs", max_dist=2
            ).collect()
        }
        want = {
            (i, 900 + j, _lev(a, b))
            for i, a in enumerate(words)
            for j, b in enumerate(words)
            if _lev(a, b) <= 2
        }
        assert len(want) > 9000
        assert got == want

    def test_k3_unsupported(self, spark):
        df = spark.createDataFrame([(1, "x")], "i int, s string")
        with pytest.raises(ValueError):
            fuzzy_join(df, df, "i", "s", "i", "s", max_dist=3)
