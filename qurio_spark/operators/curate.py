"""Training-data curation pipeline (extension beyond reference scope):
exact-dedup -> quality scoring -> per-source token-budget selection.

The canonical "build a training corpus" composition of this engine's
operators: drop exact duplicates (keep lowest id), score every
document with the cheap C4/Gopher-style quality heuristic
(operators/textstats.quality_score_expr), then greedily keep the
best documents per source until that source's token budget is spent —
per-domain budgets are how real pipelines balance corpora.  The
budget cumsum is the range-bucketed DISTRIBUTED prefix sum
(operators/prefix, r14) over the composite (quality desc, id asc)
key, so the selection scales with sources x buckets — a corpus that
is effectively one source no longer serializes through a single
window reducer, and a global budget is just the one-source case.

Everything is deterministic: quality ties break on doc id, token
counts are exact integers, and the whole pipeline is hash-checked
against a DuckDB oracle in ``__spark_entry__`` (query ``curate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.text import token_count
from qurio_spark.operators.textstats import quality_score_expr


def curate_corpus(
    docs: DataFrame,
    per_source_token_budget: int = 3000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    persist: bool = True,
) -> DataFrame:
    """-> (source, doc id, quality, n_tokens, cum_tokens) of the kept
    documents: per source, highest-quality first, while the running
    token total stays within budget.

    Stages:
      1. exact dedup: min/min_by over sha256(text), keep lowest id —
         map-side partials absorb hot-hash skew;
      2. quality + token count: pure column expressions, map-side;
      3. budget: cumulative token sum in (quality desc, id asc) order
         via the distributed prefix sum (operators/prefix — quality
         negated so the composite key is all-ascending; boundary
         sampling hash-filters on the id so only sampled rows pay for
         the quality expression); rows whose running total exceeds the
         budget fall away.  Output is bit-identical to the per-source
         window form.

    Small corpora (<= prefix.SMALL_THRESHOLD rows) take the prefix
    sum's plain-window fast path: one count job + one window, no
    boundary collect, no cache, no two-branch scan (the r14 constant
    overhead that tripled this operator at bench scale).  On the
    bucketed path the cumsum persists its bucketed frame (so the dedup
    aggregation feeding it runs once) and attaches the cache to the
    returned frame — release it with
    ``operators.cachectl.release_caches(result)`` after materializing.
    """
    # quality/token/hash are all map-side column expressions: project
    # them in the scan and drop the text BEFORE the first exchange, so
    # both window shuffles move (hash, source, id, 2 scalars) instead
    # of the full document bodies
    # the group key is the raw 32-byte digest, not the 64-char hex
    # (r16, guide §2.3): a bijection of the sha2 string, so the dedup
    # grouping is bit-identical at half the key bytes; `_h` is dropped
    # before anything leaves the operator
    prof0 = docs.select(
        F.col(source_col),
        F.col(id_col),
        F.unhex(F.sha2(F.col(text_col), 256)).alias("_h"),
        quality_score_expr(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    # keep-lowest-id per hash as a min/min_by aggregation (r14, same
    # rationale as operators/dedup.exact_dedup): partial aggregation
    # collapses a hot hash inside each map partition, so a document
    # duplicated millions of times never concentrates on one reducer.
    # Caching moved into distributed_cumsum (r15): its bucketed path
    # persists the post-dedup bucketed frame (one dedup exchange, one
    # evaluation of the expressions) and hands the cache back through
    # the returned frame; the degenerate small-corpus path consumes
    # prof exactly once and needs no cache at all.
    prof = (
        prof0.groupBy("_h")
        .agg(
            F.min(id_col).alias(id_col),
            F.min_by(source_col, F.col(id_col)).alias(source_col),
            F.min_by("quality", F.col(id_col)).alias("quality"),
            F.min_by("n_tokens", F.col(id_col)).alias("n_tokens"),
        )
        .drop("_h")
    )
    from qurio_spark.operators.cachectl import propagate_caches
    from qurio_spark.operators.prefix import distributed_cumsum

    cum = distributed_cumsum(
        prof.withColumn("_negq", -F.col("quality")),
        value_col="n_tokens",
        part_col=source_col,
        order_cols=["_negq", id_col],
        out_col="cum_tokens",
        # boundary passes sample from the PRE-dedup projection (dup
        # rows only skew bucket balance, never correctness) so they
        # never replay the dedup exchange
        sample_df=prof0.withColumn("_negq", -F.col("quality")),
        hash_col=id_col,
        persist=persist,
    )
    return propagate_caches(
        cum,
        cum.withColumn("cum_tokens", F.col("cum_tokens").cast("bigint"))
        .filter(F.col("cum_tokens") <= per_source_token_budget)
        .select(source_col, id_col, "quality", "n_tokens", "cum_tokens"),
    )
