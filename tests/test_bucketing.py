"""Bucketed co-located joins: the physical plan must lose its
Exchanges when both sides are bucketed on the join key
(plans/bucketing.py; the 100 TB repeated-join layout).
"""

import pytest
from pyspark.sql import functions as F

from qurio_spark.plans.bucketing import bucketed_tables, exchange_count, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o.withColumnRenamed("o_orderkey", "orderkey"), "b_orders", "orderkey", buckets=8)
    write_bucketed(l.withColumnRenamed("l_orderkey", "orderkey"), "b_lineitem", "orderkey", buckets=8)
    yield bucketed_tables(spark, "b_orders", "b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_is_exchange_free(self, spark, sf_dir, bucketed):
        bo, bl = bucketed
        joined = bo.join(bl, "orderkey").groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        # force the same join strategy on both comparisons: sort-merge
        # (the strategy bucketing accelerates; tiny sf would broadcast)
        assert exchange_count(bo.join(bl.hint("merge"), "orderkey")) == 0
        # the groupBy still shuffles (different key); the join does not
        plain_o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
            "o_orderkey", "orderkey"
        )
        plain_l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "orderkey"
        )
        # force the comparable non-broadcast plan on the plain side
        assert exchange_count(
            plain_o.join(plain_l.hint("merge"), "orderkey")
        ) >= 2
        assert joined.count() > 0

    def test_bucketed_results_identical(self, spark, sf_dir, bucketed):
        bo, bl = bucketed
        plain_o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
            "o_orderkey", "orderkey"
        )
        plain_l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "orderkey"
        )

        def agg(o, l):
            return sorted(
                (r["o_orderpriority"], r["n"], round(r["qty"], 2))
                for r in o.join(l, "orderkey")
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
                .collect()
            )

        assert agg(bo, bl) == agg(plain_o, plain_l)
