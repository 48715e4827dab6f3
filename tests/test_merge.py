"""Generic keyed MERGE on parquet (plans/merge.merge_upsert):
update/insert/untouched semantics, schema guard, and the dynamic
partition overwrite claim (unaffected partitions are not rewritten)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qurio_spark.plans.merge import merge_upsert


def _rows(spark, path):
    return {
        r["k"]: (r["v"], r["p"]) for r in spark.read.parquet(path).collect()
    }


def _write_target(spark, path):
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p2")],
        "k long, v string, p string",
    ).repartition("p").write.mode("overwrite").partitionBy("p").parquet(path)


def test_update_insert_untouched(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [(2, "B2", "p1"), (9, "new", "p1")], "k long, v string, p string"
    )
    merge_upsert(spark, path, updates, key_cols=["k"], partition_col="p")
    assert _rows(spark, path) == {
        1: ("a", "p1"),    # untouched, matched partition
        2: ("B2", "p1"),   # updated
        9: ("new", "p1"),  # inserted
        3: ("c", "p2"),    # untouched partition survives
        4: ("d", "p2"),
    }


def test_unaffected_partition_files_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_target(spark, path)
    p2_files = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(f"{path}/p=p2")
        for f in files
        if f.endswith(".parquet")
    }
    assert p2_files
    updates = spark.createDataFrame(
        [(1, "A1", "p1")], "k long, v string, p string"
    )
    merge_upsert(spark, path, updates, key_cols=["k"], partition_col="p")
    p2_after = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(f"{path}/p=p2")
        for f in files
        if f.endswith(".parquet")
    }
    assert p2_after == p2_files  # dynamic overwrite left p2 alone
    assert _rows(spark, path)[1] == ("A1", "p1")


def test_unpartitioned_full_rewrite(spark, tmp_path):
    path = str(tmp_path / "t3")
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "k long, v string, p string"
    ).write.mode("overwrite").parquet(path)
    updates = spark.createDataFrame(
        [(2, "B", "p2"), (3, "c", "p1")], "k long, v string, p string"
    )
    merge_upsert(spark, path, updates, key_cols=["k"])
    assert _rows(spark, path) == {
        1: ("a", "p1"), 2: ("B", "p2"), 3: ("c", "p1")
    }


def test_composite_key_and_column_order(spark, tmp_path):
    path = str(tmp_path / "t4")
    spark.createDataFrame(
        [(1, "x", "a", "p1"), (1, "y", "b", "p1")],
        "k long, sub string, v string, p string",
    ).write.mode("overwrite").partitionBy("p").parquet(path)
    # updates given in a DIFFERENT column order: merge must align
    updates = spark.createDataFrame(
        [("B", 1, "y", "p1")], "v string, k long, sub string, p string"
    )
    merge_upsert(spark, path, updates, key_cols=["k", "sub"], partition_col="p")
    got = {
        (r["k"], r["sub"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "x"): "a", (1, "y"): "B"}


def test_missing_columns_raise(spark, tmp_path):
    path = str(tmp_path / "t5")
    _write_target(spark, path)
    bad = spark.createDataFrame([(2, "p1")], "k long, p string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(spark, path, bad, key_cols=["k"], partition_col="p")


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t6")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [(2, "B2", "p1"), (9, "new", "p2")], "k long, v string, p string"
    )
    merge_upsert(spark, path, updates, key_cols=["k"], partition_col="p")
    once = _rows(spark, path)
    merge_upsert(spark, path, updates, key_cols=["k"], partition_col="p")
    assert _rows(spark, path) == once  # re-applying the batch is a no-op
