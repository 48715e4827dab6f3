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
