"""Bucketed co-located joins — the write-time answer to repeated
big-big join shuffles.

A fact table that is repeatedly joined on the same key (chunks x
embeddings on chunk id, lineitem x orders on orderkey, postings x
doclen on doc id) should be WRITTEN ``bucketBy(key)``: both sides then
arrive pre-partitioned on the join key and the sort-merge join runs
with ZERO Exchange operators — at 100 TB that is the difference
between a multi-TB shuffle per query and none (tests/test_bucketing.py
asserts the Exchange count on the physical plan).

Bucketing differs from ``partitionBy``: partition columns create
directories (good for pruning low-cardinality predicates, e.g.
source_id / label), bucket columns hash rows into a fixed number of
files per partition (good for high-cardinality join/groupBy keys).
The two compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    ``sorted_by_key`` additionally sorts within buckets so sort-merge
    joins skip their per-task sort.  Bucket count is a layout contract:
    joins are exchange-free only between tables with the SAME bucket
    count on the join key — pick one per key domain and keep it.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    )
    if sorted_by_key:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan — the
    thing bucketing is supposed to drive to zero.  Broadcast exchanges
    don't count (they move the small side, not the bucketed data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )


def bucketed_tables(spark: SparkSession, *names: str):
    """Convenience: spark.table for each bucketed table name."""
    return tuple(spark.table(n) for n in names)
