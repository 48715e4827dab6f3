"""Sharding operators: token-budget packing and deterministic mixture
sampling (operators/sharding.py).
"""

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.sharding import pack_shards, sample_mixture


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestPackShards:
    def test_offset_rule(self, spark):
        rows = [("s", i, "tok " * 100) for i in range(10)]  # 100 tokens each
        df = spark.createDataFrame(rows, "source string, doc_id long, text string")
        got = {
            r["doc_id"]: r["shard_id"]
            for r in pack_shards(df, token_budget=250).collect()
        }
        # starts: 0,100,200,300,... -> shards 0,0,0,1,1,2,2,2,3,3
        assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}

    def test_shards_contiguous_per_source(self, docs):
        packed = pack_shards(docs, token_budget=2000)
        per_source = (
            packed.groupBy("source")
            .agg(
                F.min("shard_id").alias("mn"),
                F.max("shard_id").alias("mx"),
                F.countDistinct("shard_id").alias("n"),
            )
            .collect()
        )
        for r in per_source:
            assert r["mn"] == 0
            assert r["n"] == r["mx"] + 1  # no gaps

    def test_shard_sizes_near_budget(self, docs):
        budget = 2000
        packed = pack_shards(docs, token_budget=budget)
        sizes = (
            packed.groupBy("source", "shard_id")
            .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("mx"))
            .collect()
        )
        # a shard exceeds the budget by less than its largest doc
        for r in sizes:
            assert r["t"] < budget + r["mx"]


class TestSampleMixture:
    def test_deterministic_and_weighted(self, docs):
        w = {"src1": 1.0, "src2": 0.5}
        a = {r["doc_id"] for r in sample_mixture(docs, w, default_weight=0.0).collect()}
        b = {r["doc_id"] for r in sample_mixture(docs, w, default_weight=0.0).collect()}
        assert a == b  # reproducible
        src1 = docs.filter(F.col("source") == "src1").count()
        kept = sample_mixture(docs, w, default_weight=0.0)
        assert kept.filter(F.col("source") == "src1").count() == src1  # p=1 keeps all
        other = kept.filter(~F.col("source").isin("src1", "src2")).count()
        assert other == 0  # default 0 drops the rest

    def test_salt_draws_independent_sample(self, docs):
        w = {"src2": 0.5}
        a = {r["doc_id"] for r in sample_mixture(docs, w, salt="mix").collect()}
        b = {r["doc_id"] for r in sample_mixture(docs, w, salt="mix2").collect()}
        assert a != b

    def test_weight_validation(self, docs):
        with pytest.raises(ValueError):
            sample_mixture(docs, {"src1": 1.5})
        with pytest.raises(ValueError):
            sample_mixture(docs, {}, default_weight=-0.1)


class TestSampleMixtureEdges:
    def test_empty_weights_uses_default(self, spark):
        df = spark.createDataFrame([("s1", 1), ("s2", 2)], "source string, doc_id long")
        assert sample_mixture(df, {}, default_weight=1.0).count() == 2
        assert sample_mixture(df, {}, default_weight=0.0).count() == 0


class TestStratifiedSampleExact:
    def test_exact_counts_and_determinism(self, spark, sf_dir):
        from qurio_spark.operators.sharding import stratified_sample_exact

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = stratified_sample_exact(d, n_per_stratum=10)
        sizes = {
            r["source"]: r["n"]
            for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        full = {
            r["source"]: r["n"]
            for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert sizes == {s: min(10, n) for s, n in full.items()}
        # physical layout must not change the sample (the sampleBy flaw)
        a = sorted(r["doc_id"] for r in got.collect())
        b = sorted(
            r["doc_id"]
            for r in stratified_sample_exact(
                d.repartition(13), n_per_stratum=10
            ).collect()
        )
        assert a == b

    def test_salt_draws_different_sample(self, spark, sf_dir):
        from qurio_spark.operators.sharding import stratified_sample_exact

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = {r["doc_id"] for r in stratified_sample_exact(d, 10, salt="a").collect()}
        b = {r["doc_id"] for r in stratified_sample_exact(d, 10, salt="b").collect()}
        assert a != b  # independent draws

    def test_n_larger_than_stratum_keeps_all(self, spark):
        from qurio_spark.operators.sharding import stratified_sample_exact

        d = spark.createDataFrame(
            [(i, "only") for i in range(5)], "doc_id long, source string"
        )
        assert stratified_sample_exact(d, 100).count() == 5

    def test_invalid_n_raises(self, spark, sf_dir):
        from qurio_spark.operators.sharding import stratified_sample_exact

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with pytest.raises(ValueError, match="positive"):
            stratified_sample_exact(d, 0)


class TestWeightedSample:
    def test_deterministic_and_weight_monotone(self, spark):
        from qurio_spark.operators.sharding import weighted_sample

        rows = [(i, 10 if i % 10 else 10_000) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        a = [r["doc_id"] for r in weighted_sample(df, 50, "w").collect()]
        b = [r["doc_id"] for r in weighted_sample(df, 50, "w").collect()]
        assert a == b  # no RNG, plan/partitioning independent
        # the 20 heavy rows (1000x weight) should essentially all make
        # a 50-of-200 sample; a uniform sampler would take ~5
        heavy = [d for d in a if d % 10 == 0]
        assert len(heavy) >= 18

    def test_sample_is_without_replacement_and_sized(self, spark):
        from qurio_spark.operators.sharding import weighted_sample

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "doc_id long, w long"
        )
        out = weighted_sample(df, 10, "w").collect()
        ids = [r["doc_id"] for r in out]
        assert len(ids) == 10 == len(set(ids))
        # n >= rows: everything included once
        assert len(weighted_sample(df, 100, "w").collect()) == 30


class TestExportJsonlShards:
    def _docs(self, spark):
        rows = [
            ("a", i, f"tok{i} " * 5) for i in range(12)
        ] + [("b", i, f"btk{i} " * 3) for i in range(6)]
        return spark.createDataFrame(rows, "source string, doc_id long, text string")

    def test_files_manifest_and_determinism(self, spark, tmp_path):
        import hashlib
        import json
        import os

        from qurio_spark.operators.sharding import export_jsonl_shards

        d1, d2 = str(tmp_path / "x1"), str(tmp_path / "x2")
        m1 = export_jsonl_shards(self._docs(spark), d1, token_budget=20).collect()
        m2 = export_jsonl_shards(self._docs(spark), d2, token_budget=20).collect()
        assert [r.asDict() for r in m1] == [r.asDict() for r in m2]
        assert m1, "at least one shard"
        for r in m1:
            p = os.path.join(d1, r["shard"] + ".jsonl")
            payload = open(p, "rb").read()
            # manifest checksum matches bytes on disk
            assert hashlib.sha256(payload).hexdigest() == r["sha256"]
            assert len(payload) == r["n_bytes"]
            lines = payload.decode().splitlines()
            assert len(lines) == r["n_docs"]
            ids = [json.loads(ln)["id"] for ln in lines]
            assert ids == sorted(ids)
        # byte-identical across the two runs
        for r in m1:
            b1 = open(os.path.join(d1, r["shard"] + ".jsonl"), "rb").read()
            b2 = open(os.path.join(d2, r["shard"] + ".jsonl"), "rb").read()
            assert b1 == b2
        # every doc lands in exactly one shard line
        total = sum(r["n_docs"] for r in m1)
        assert total == 18
        # manifest file mirrors the returned frame
        mf = [
            json.loads(ln)
            for ln in open(os.path.join(d1, "_manifest.jsonl"))
        ]
        assert [m["shard"] for m in mf] == [r["shard"] for r in m1]

    def test_matches_pack_shards_assignment(self, spark, tmp_path):
        import json
        import os

        from qurio_spark.operators.sharding import export_jsonl_shards

        docs = self._docs(spark)
        out = str(tmp_path / "x3")
        export_jsonl_shards(docs, out, token_budget=20)
        assign = {
            (r["source"], r["doc_id"]): r["shard_id"]
            for r in pack_shards(docs, 20).collect()
        }
        for fn in os.listdir(out):
            if fn == "_manifest.jsonl" or not fn.endswith(".jsonl"):
                continue
            src, sid = fn[:-6].rsplit("-", 1)
            for ln in open(os.path.join(out, fn)):
                doc = json.loads(ln)
                assert assign[(src, doc["id"])] == int(sid)

    def test_inprogress_leftover_and_reexport(self, spark, tmp_path):
        import json
        import os

        from qurio_spark.operators.sharding import export_jsonl_shards

        out = str(tmp_path / "x4")
        os.makedirs(out)
        # crash leftover from a previous attempt + a stale shard file:
        # the atomic tmp+rename publish must replace the stale file and
        # never expose partial bytes under the final name
        with open(os.path.join(out, "a-0.jsonl.inprogress"), "w") as f:
            f.write("partial garbage")
        with open(os.path.join(out, "a-0.jsonl"), "w") as f:
            f.write("stale content\n")
        m = export_jsonl_shards(self._docs(spark), out, token_budget=20).collect()
        shard0 = [r for r in m if r["shard"] == "a-0"]
        assert shard0, "shard a-0 exists"
        payload = open(os.path.join(out, "a-0.jsonl"), "rb").read()
        assert b"stale" not in payload
        assert len(payload) == shard0[0]["n_bytes"]
        # every published line is complete JSON (atomicity: no partials)
        for ln in payload.decode().splitlines():
            json.loads(ln)
        # manifest lists no phantom shards from the leftover tmp file
        names = {r["shard"] for r in m}
        files = {
            fn[:-6]
            for fn in os.listdir(out)
            if fn.endswith(".jsonl") and fn != "_manifest.jsonl"
        }
        assert files == names

    def test_shard_spanning_arrow_batches(self, spark, tmp_path):
        """12k docs land in ONE shard: mapInPandas receives the
        partition as multiple Arrow batches (default 10k rows/batch),
        and the per-partition concat must write the shard ONCE with
        every row — the per-batch-write bug would truncate to the last
        batch."""
        import json
        import os

        from qurio_spark.operators.sharding import export_jsonl_shards

        docs = spark.range(12000).selectExpr(
            "'s' AS source", "id AS doc_id", "'t' AS text"
        )
        out = str(tmp_path / "x5")
        m = export_jsonl_shards(docs, out, token_budget=10**9).collect()
        assert len(m) == 1 and m[0]["n_docs"] == 12000
        lines = open(os.path.join(out, m[0]["shard"] + ".jsonl")).read().splitlines()
        assert len(lines) == 12000
        ids = [json.loads(ln)["id"] for ln in lines]
        assert ids == list(range(12000))

    def test_text_roundtrip_escaping(self, spark, tmp_path):
        """Newlines, quotes, backslashes and multibyte text must
        round-trip through the JSONL encoding exactly — one line per
        doc regardless of embedded newlines."""
        import json
        import os

        from qurio_spark.operators.sharding import export_jsonl_shards

        texts = [
            'line1\nline2\n\ttabbed "quoted" back\\slash',
            "unicode: é 漢字 🙂    ",
            "",
            "plain",
        ]
        docs = spark.createDataFrame(
            [("s", i, t) for i, t in enumerate(texts)],
            "source string, doc_id long, text string",
        )
        out = str(tmp_path / "x6")
        export_jsonl_shards(docs, out, token_budget=10**9)
        got = {}
        for fn in os.listdir(out):
            if fn.endswith(".jsonl") and fn != "_manifest.jsonl":
                for ln in open(os.path.join(out, fn), encoding="utf-8"):
                    d = json.loads(ln)
                    got[d["id"]] = d["text"]
        assert got == {i: t for i, t in enumerate(texts)}


class TestPackSequences:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "source string, doc_id int, text string"
        )

    def test_long_doc_spans_sequences(self, spark):
        from qurio_spark.operators.sharding import pack_sequences

        # 10 tokens at seq_len 4 -> seqs 0,1 full + seq 2 with 2
        docs = self._mk(spark, [("s", 1, "t " * 10)])
        out = {
            r["seq_id"]: (r["n_docs"], r["n_tokens"])
            for r in pack_sequences(docs, 4).collect()
        }
        assert out == {0: (1, 4), 1: (1, 4), 2: (1, 2)}

    def test_boundary_and_carryover(self, spark):
        from qurio_spark.operators.sharding import pack_sequences

        # 3 + 4 + 1 tokens at seq_len 4: doc2 straddles seqs 0/1
        docs = self._mk(
            spark, [("s", 1, "a b c"), ("s", 2, "d e f g"), ("s", 3, "h")]
        )
        out = {
            r["seq_id"]: (r["n_docs"], r["n_tokens"])
            for r in pack_sequences(docs, 4).collect()
        }
        assert out == {0: (2, 4), 1: (2, 4)}

    def test_empty_docs_skipped_and_sources_independent(self, spark):
        from qurio_spark.operators.sharding import pack_sequences

        docs = self._mk(
            spark,
            [("a", 1, "x y"), ("a", 2, ""), ("a", 3, "z"),
             ("b", 1, "p q r")],
        )
        rows = {
            (r["source"], r["seq_id"]): (r["n_docs"], r["n_tokens"])
            for r in pack_sequences(docs, 4).collect()
        }
        # the empty doc contributes nothing; each source packs alone
        assert rows == {("a", 0): (2, 3), ("b", 0): (1, 3)}

    def test_every_sequence_full_except_last(self, spark):
        from qurio_spark.operators.sharding import pack_sequences

        docs = self._mk(
            spark, [("s", i, "w " * (3 + i % 5)) for i in range(40)]
        )
        rows = sorted(
            pack_sequences(docs, 16).collect(), key=lambda r: r["seq_id"]
        )
        assert all(r["n_tokens"] == 16 for r in rows[:-1])
        total = sum(3 + i % 5 for i in range(40))
        assert sum(r["n_tokens"] for r in rows) == total

    def test_token_count_override(self, spark):
        from qurio_spark.operators.sharding import pack_sequences

        docs = self._mk(spark, [("s", 1, "a b"), ("s", 2, "c d")])
        out = pack_sequences(
            docs, 4, token_count=lambda c: F.lit(4)
        ).collect()
        assert {(r["seq_id"], r["n_docs"], r["n_tokens"]) for r in out} == {
            (0, 1, 4), (1, 1, 4),
        }
