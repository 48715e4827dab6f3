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


class TestDriftGatedRefit:
    """plans/maintenance.maybe_refit_ivf / maybe_refit_pq: the drift
    metrics' consumers.  In-distribution appends stay appends (old
    files untouched); a shifted batch trips the gate; post-refit the
    index is bit-identical to a fresh build over the same row set
    (hash-seeded fits are deterministic)."""

    @pytest.fixture()
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )

    def test_ivf_append_then_drift_refit(self, spark, emb, tmp_path):
        import os

        from qurio_spark.operators.similarity import (
            ivf_build,
            read_ivf_index,
            write_ivf_index,
        )
        from qurio_spark.plans.maintenance import (
            maybe_refit_ivf,
            write_ivf_stats,
        )

        base = emb.filter(F.col("vec_id") % 3 != 0)
        ok_delta = emb.filter(F.col("vec_id") % 3 == 0)
        path = str(tmp_path / "ivf")
        labeled, cdf = ivf_build(base, k=4, iters=2)
        write_ivf_index(labeled, cdf, path)
        write_ivf_stats(spark, path)

        before = {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(f"{path}/labeled")
            for f in fs
            if f.endswith(".parquet")
        }
        rep = maybe_refit_ivf(spark, path, ok_delta)
        assert rep["action"] == "append" and rep["ratio"] <= 2.0
        after = {p: os.path.getmtime(p) for p in before if os.path.exists(p)}
        assert after == before  # in-distribution append: old files untouched

        shifted = emb.withColumn(
            "embedding", F.transform("embedding", lambda x: x + F.lit(9.0))
        ).withColumn("vec_id", F.col("vec_id") + 100000)
        rep2 = maybe_refit_ivf(spark, path, shifted, iters=2)
        assert rep2["action"] == "refit" and rep2["ratio"] > 2.0

        # parity: the refit index == a fresh deterministic build over
        # the same row set
        from qurio_spark.functions.checkpointing import checkpoint_df

        union = checkpoint_df(
            base.unionByName(ok_delta).unionByName(shifted), eager=True
        )
        want_labeled, want_cdf = ivf_build(union, k=4, iters=2)
        got_labeled, got_cdf = read_ivf_index(spark, path)
        got = {(r["vec_id"], r["label"]) for r in got_labeled.collect()}
        want = {(r["vec_id"], r["label"]) for r in want_labeled.collect()}
        assert got == want
        gc = {r["label"]: list(r["centroid"]) for r in got_cdf.collect()}
        wc = {r["label"]: list(r["centroid"]) for r in want_cdf.collect()}
        assert gc == wc

    def test_ivf_requires_baseline(self, spark, emb, tmp_path):
        from qurio_spark.operators.similarity import ivf_build, write_ivf_index
        from qurio_spark.plans.maintenance import maybe_refit_ivf

        path = str(tmp_path / "ivf_nostats")
        labeled, cdf = ivf_build(emb, k=4, iters=1)
        write_ivf_index(labeled, cdf, path)
        with pytest.raises(ValueError, match="write_ivf_stats"):
            maybe_refit_ivf(spark, path, emb)

    def test_pq_append_then_drift_refit(self, spark, emb, tmp_path):
        from qurio_spark.operators.pq import (
            pq_encode,
            pq_fit,
            read_pq_index,
            write_pq_index,
        )
        from qurio_spark.plans.maintenance import maybe_refit_pq, write_pq_stats

        base = emb.filter(F.col("vec_id") % 3 != 0)
        ok_delta = emb.filter(F.col("vec_id") % 3 == 0)
        path = str(tmp_path / "pq")
        books = pq_fit(base, m=8, k=16, iters=3)
        write_pq_index(pq_encode(base, books, packed=True), books, path)
        write_pq_stats(spark, path, base)

        rep = maybe_refit_pq(spark, path, ok_delta)
        assert rep["action"] == "append" and rep["ratio"] <= 2.0
        merged, _ = read_pq_index(spark, path)
        assert merged.count() == emb.count()

        shifted = emb.withColumn(
            "embedding", F.transform("embedding", lambda x: x + F.lit(9.0))
        ).withColumn("vec_id", F.col("vec_id") + 100000)
        # without the raw corpus the gate still answers, as an error
        with pytest.raises(ValueError, match="full_corpus"):
            maybe_refit_pq(spark, path, shifted)

        full = base.unionByName(ok_delta).unionByName(shifted)
        rep2 = maybe_refit_pq(spark, path, shifted, full_corpus=full)
        assert rep2["action"] == "refit" and rep2["ratio"] > 2.0

        # parity: refit index == fresh deterministic fit+encode of the
        # same corpus, still packed
        from qurio_spark.functions.checkpointing import checkpoint_df

        corpus = checkpoint_df(full.select("vec_id", "embedding"), eager=True)
        want_books = pq_fit(corpus, m=8, k=16, iters=10)
        got_codes, got_books = read_pq_index(spark, path)
        assert got_books == [
            [list(map(float, c)) for c in book] for book in want_books
        ]
        want_codes = {
            (r["vec_id"], r["codes"])
            for r in pq_encode(corpus, want_books, packed=True).collect()
        }
        got = {(r["vec_id"], r["codes"]) for r in got_codes.collect()}
        assert got == want_codes
