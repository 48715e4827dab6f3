"""functions/bpe: distributed-wordcount BPE training + hermetic apply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurio_spark.functions.bpe import (
    EOW,
    BpeTokenizer,
    _merge_word,
    train_bpe,
)


class TestTrainBpe:
    def test_hand_computed_merges(self, spark):
        # corpus: "low" x3, "lower" x1 -> symbol stream has (l,o) x4,
        # (o,w) x4, (w,</w>) x3, (w,e) (e,r) (r,</w>) x1.
        # merge 1: count 4 tie between (l,o) and (o,w) -> lexicographic
        # min = ('l','o').  merge 2: ('lo','w') count 4.  merge 3:
        # ('low','</w>') count 3.
        docs = spark.createDataFrame(
            [(1, "low low low lower")], "doc_id int, text string"
        )
        merges = train_bpe(docs, n_merges=3)
        assert merges == [("l", "o"), ("lo", "w"), ("low", EOW)]

    def test_merge_stops_below_two(self, spark):
        # every pair unique -> no merge has count >= 2
        docs = spark.createDataFrame([(1, "abc")], "doc_id int, text string")
        merges = train_bpe(docs, n_merges=10)
        assert merges == []

    def test_deterministic_across_runs(self, spark):
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma{i % 3} alpha") for i in range(30)],
            "doc_id int, text string",
        )
        a = train_bpe(docs, n_merges=20)
        b = train_bpe(docs, n_merges=20)
        assert a == b and len(a) > 5

    def test_merge_word_non_overlapping(self):
        # merging (a,a) in "aaaa" pairs left-to-right: aa + aa
        assert _merge_word(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")


class TestBpeTokenizer:
    def test_encode_follows_rank_order(self):
        tok = BpeTokenizer([("l", "o"), ("lo", "w"), ("low", EOW)])
        assert tok.encode_word("low") == ["low</w>"]
        assert tok.encode_word("lower") == ["low", "e", "r", EOW]
        # (low, </w>) still fires once "low" forms inside "slow"
        assert tok.encode_word("slow") == ["s", "low</w>"]

    def test_encode_text_splits_like_shared_tokenizer(self):
        tok = BpeTokenizer([])
        assert tok.encode_text("Hi, lo!") == ["h", "i", EOW, "l", "o", EOW]
        assert tok.encode_text("") == []
        assert tok.encode_text(None) == []

    def test_count_udf_memo_matches_encode_text(self, spark):
        # r15: count_udf memoizes word -> token count per worker; the
        # memoized counts must equal len(encode_text) exactly, including
        # repeated words (cache hits), unseen words (misses), and
        # empty/None texts
        tok = BpeTokenizer([("l", "o"), ("lo", "w"), ("low", EOW)])
        texts = [
            "low low lower slow",
            "low",
            "",
            None,
            "slow lower low low low",
            "brand new words here",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, text string"
        )
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", tok.count_udf()(F.col("text")).alias("n")
            ).collect()
        }
        want = {i: len(tok.encode_text(t)) for i, t in enumerate(texts)}
        assert got == want

    def test_count_udf_drives_pack_shards(self, spark):
        from qurio_spark.operators.sharding import pack_shards

        docs = spark.createDataFrame(
            [("s", i, "low low low lower") for i in range(4)],
            "source string, doc_id int, text string",
        )
        merges = train_bpe(docs, n_merges=3)
        tok = BpeTokenizer(merges)
        # "low" -> 1 symbol, "lower" -> 4 -> 3*1 + 4 = 7 per doc
        out = pack_shards(
            docs, token_budget=14, token_count=tok.count_udf()
        ).orderBy("doc_id").collect()
        assert [r["n_tokens"] for r in out] == [7, 7, 7, 7]
        assert [r["shard_id"] for r in out] == [0, 0, 1, 1]

    def test_train_then_encode_roundtrip_covers_corpus(self, spark):
        # every trained merge must be reachable at encode time: encoding
        # the training corpus with its own merges yields no leftover
        # mergeable pair
        docs = spark.createDataFrame(
            [(1, "banana bandana cabana")], "doc_id int, text string"
        )
        merges = train_bpe(docs, n_merges=10)
        tok = BpeTokenizer(merges)
        for w in ["banana", "bandana", "cabana"]:
            syms = tok.encode_word(w)
            ranks = tok.ranks
            assert all(
                (a, b) not in ranks for a, b in zip(syms, syms[1:])
            ), (w, syms)
