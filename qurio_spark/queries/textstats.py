"""Text-analysis queries: token counts, quality, lang-id,
fingerprints, repetition, word concentration, PII redaction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from qurio_spark.functions.frames import local_frame
from qurio_spark.functions.numeric import stable_round

from .common import (
    QUERY_TEXT,
    QUERY_VEC_ID,
    _docs_with_vecs,
    _epoch_secs,
    _events,
    _normalize_events_ts,
    _qvec,
    _t,
)

from qurio_spark.operators.textstats import text_profile


def q_token_counts(spark, sf_dir):
    p = text_profile(_t(spark, sf_dir, "documents"))
    return p.select("doc_id", "n_tokens", "n_bpeish_tokens", "n_distinct_tokens")


def q_quality_scores(spark, sf_dir):
    p = text_profile(_t(spark, sf_dir, "documents"))
    return p.select("doc_id", "quality")


def q_lang_id(spark, sf_dir):
    p = text_profile(_t(spark, sf_dir, "documents"))
    return p.select("doc_id", "lang_guess")


def q_fingerprints(spark, sf_dir):
    p = text_profile(_t(spark, sf_dir, "documents"))
    return p.select("doc_id", "fingerprint")


def q_repetition(spark, sf_dir):
    """Gopher-style repetition metrics (distinct-word ratio,
    duplicate-bigram fraction) — map-only array expressions."""
    from qurio_spark.operators.textstats import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"))


def q_word_concentration(spark, sf_dir):
    """Top-word fraction per document: explode -> partial-agg counts ->
    per-doc argmax window (ties to the first word alphabetically)."""
    from qurio_spark.operators.textstats import word_concentration

    return word_concentration(_t(spark, sf_dir, "documents"))


def q_pii_redact(spark, sf_dir):
    """PII scrub pass: per-doc match count + redacted-text fingerprint
    (functions/text.PII_PATTERNS applied as a regexp_replace chain)."""
    from qurio_spark.operators.textstats import pii_profile

    return pii_profile(_t(spark, sf_dir, "documents"))




def q_keyword_extract(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (operators/textstats.
    keyword_extract) — document tagging for curation/mixture tooling;
    BM25-index-build shape with a per-doc ranking window."""
    from qurio_spark.operators.textstats import keyword_extract

    return keyword_extract(_t(spark, sf_dir, "documents"), topk=3)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing >= 1 word-4-gram
    with the 'benchmark' slice (doc_id % 100 == 7, excluded from the
    training side) are flagged with their shared-shingle counts
    (operators/dedup.contamination_flags; the n-gram overlap check run
    before any training-data release)."""
    from qurio_spark.operators.dedup import contamination_flags

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 7)
    train = docs.filter(F.col("doc_id") % 100 != 7)
    return contamination_flags(train, bench, n=4)


def q_gopher_rules(spark, sf_dir):
    """The Gopher quality-filter rule set (Rae et al. 2021 A1.1) as
    per-document 0/1 gates + the pass conjunction
    (operators/textstats.gopher_rules): word-count bounds, mean word
    length, symbol ratio, bullet/ellipsis line ratios, alphabetic-word
    ratio, stop-word presence — the canonical hard document filter a
    pretraining corpus runs before anything else.  Pure column
    expressions, one map-stage scan."""
    from qurio_spark.operators.textstats import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"))


def q_lm_quality(spark, sf_dir):
    """Bigram-LM cross-entropy quality scoring (operators/lm.
    lm_cross_entropy) — the CCNet/RedPajama perplexity filter shape
    (Wenzek et al. 2020): an add-one bigram LM with a 512-token capped
    vocabulary is fit on the reference subset ``doc_id % 5 = 0`` and
    every document is scored in EXACT integer milli-nats
    (floor(1000 * (ln(c1+V) - ln(c2+1))) summed per doc — ln over
    exact integer counts only, so the contract is order-invariant
    integer arithmetic; see the module doc).  Corpus side: token
    explode + broadcast vocab mapping + LM joins + ONE per-doc
    shuffle.  Beyond-reference extension (SURVEY §2.8 text-analysis
    family)."""
    from qurio_spark.operators.lm import lm_cross_entropy

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 == 0)
    return lm_cross_entropy(docs, train, max_vocab=512)


def q_bpe_tokenize(spark, sf_dir):
    """Corpus-trained BPE token counts (functions/bpe): ONE
    distributed word-count pass builds the bounded frequency
    dictionary, a driver-side merge loop learns 100 merge rules from
    it (Sennrich et al. 2016 — the same division of labor real
    tokenizer trainers use), and the counts apply via an
    Arrow-batched pandas UDF.  Rows-only check (BPE merge training is
    not SQL-expressible); the training loop, encode semantics, and
    the pack_shards override path are golden-pinned in
    tests/test_bpe.py.  Beyond-reference extension — with
    providers.HttpTokenizer this completes the pluggable-tokenizer
    slot for shard budgeting (VERDICT r12 #5)."""
    from qurio_spark.functions.bpe import BpeTokenizer, train_bpe

    docs = _t(spark, sf_dir, "documents")
    tok = BpeTokenizer(train_bpe(docs, n_merges=100, max_words=5000))
    return docs.select(
        "doc_id", tok.count_udf()(F.col("text")).alias("n_bpe_tokens")
    )


def q_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail selection (operators/lm.lm_buckets):
    the lm_quality scores ranked WITHIN each source by the per-bigram
    ratio (one IEEE division of two exact integers, bit-identical in
    any engine; doc_id tie-break) and split into 3 equal-frequency
    buckets via the SQL-standard ntile — bucket 1 is the head slice a
    CCNet pipeline keeps.  One extra per-source window shuffle on top
    of the scoring plan, never a global sort.  Beyond-reference
    extension (SURVEY §2.8)."""
    from qurio_spark.operators.lm import lm_buckets

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 == 0)
    return lm_buckets(docs, train, n_buckets=3, max_vocab=512)
