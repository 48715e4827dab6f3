"""Small-file compaction (plans/maintenance.py): fragmented partitions
collapse to one file each, healthy partitions' files stay untouched,
rows are byte-identical.
"""

import os

import pytest
from pyspark.sql import functions as F

from qurio_spark.plans.maintenance import compact_partitions, small_file_partitions


@pytest.fixture()
def fragmented_store(spark, tmp_path):
    path = str(tmp_path / "store")
    # s1: written in 6 slices -> 6 files; s2: one slice -> 1 file
    for i in range(6):
        spark.createDataFrame(
            [("s1", i * 10 + j, f"row {i}-{j}") for j in range(10)],
            "source_id string, k long, v string",
        ).coalesce(1).write.mode("append").partitionBy("source_id").parquet(path)
    spark.createDataFrame(
        [("s2", j, f"row2 {j}") for j in range(10)],
        "source_id string, k long, v string",
    ).coalesce(1).write.mode("append").partitionBy("source_id").parquet(path)
    return path


def _files(path, part):
    d = os.path.join(path, f"source_id={part}")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


class TestCompaction:
    def test_only_fragmented_partitions_rewritten(self, spark, fragmented_store):
        path = fragmented_store
        assert len(_files(path, "s1")) == 6
        s2_before = _files(path, "s2")
        before = sorted(
            tuple(r) for r in spark.read.parquet(path).collect()
        )

        assert small_file_partitions(path, "source_id", 1) == ["s1"]
        n = compact_partitions(spark, path, max_files=1)
        assert n == 1
        assert len(_files(path, "s1")) == 1
        assert _files(path, "s2") == s2_before  # untouched files
        after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
        assert after == before

    def test_noop_when_healthy(self, spark, fragmented_store):
        path = fragmented_store
        compact_partitions(spark, path, max_files=1)
        assert compact_partitions(spark, path, max_files=1) == 0


class TestEncodedPartitionValues:
    def test_special_char_partition_value(self, spark, tmp_path):
        """Partition values with characters Spark URL-encodes in the
        directory name must still be detected and compacted."""
        path = str(tmp_path / "enc")
        for i in range(3):
            spark.createDataFrame(
                [("a b:c", i, "x")], "source_id string, k long, v string"
            ).coalesce(1).write.mode("append").partitionBy("source_id").parquet(path)
        vals = small_file_partitions(path, "source_id", 1)
        assert vals == ["a b:c"]
        assert compact_partitions(spark, path, max_files=1) == 1
        rows = spark.read.parquet(path).collect()
        assert len(rows) == 3 and all(r["source_id"] == "a b:c" for r in rows)
        assert small_file_partitions(path, "source_id", 1) == []
