"""Salted aggregation / salted broadcast join == their unsalted twins
(skew mitigation must never change results)."""

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.skew import salted_agg, salted_broadcast_left


@pytest.fixture()
def skewed(spark):
    # key 'hot' owns 90% of rows
    rows = [("hot" if i % 10 else f"k{i}", float(i), i) for i in range(500)]
    return spark.createDataFrame(rows, "key string, v double, n long")


def test_salted_agg_matches_plain(spark, skewed):
    got = {
        r["key"]: (r["sum_v"], r["count_n"], r["min_n"], r["max_n"])
        for r in salted_agg(
            skewed, ["key"], {"v": "sum", "n": "count"}, salt_n=8
        ).join(
            salted_agg(skewed, ["key"], {"n": "min"}, salt_n=8), "key"
        ).join(
            salted_agg(skewed, ["key"], {"n": "max"}, salt_n=8), "key"
        ).collect()
    }
    want = {
        r["key"]: (r["sum_v"], r["count_n"], r["min_n"], r["max_n"])
        for r in skewed.groupBy("key")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("n").alias("count_n"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["key"], {"v": "avg"})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(1, 500, 10)],
        "key string, label string",
    )
    got = sorted(
        (r["key"], r["n"], r["label"])
        for r in salted_broadcast_left(skewed, dim, "key", salt_n=4).collect()
    )
    want = sorted(
        (r["key"], r["n"], r["label"]) for r in skewed.join(dim, "key", "left").collect()
    )
    assert got == want
