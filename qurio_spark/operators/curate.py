"""Training-data curation pipeline (extension beyond reference scope):
exact-dedup -> quality scoring -> per-source token-budget selection.

The canonical "build a training corpus" composition of this engine's
operators: drop exact duplicates (keep lowest id), score every
document with the cheap C4/Gopher-style quality heuristic
(operators/textstats.quality_score_expr), then greedily keep the
best documents per source until that source's token budget is spent —
per-domain budgets are how real pipelines balance corpora, and they
keep the cumulative-sum window PARTITIONED (by source), so the
selection scales with source cardinality instead of collapsing into a
single global sort.  A global budget variant would range-partition on
the quality key and resolve the boundary bucket driver-side.

Everything is deterministic: quality ties break on doc id, token
counts are exact integers, and the whole pipeline is hash-checked
against a DuckDB oracle in ``__spark_entry__`` (query ``curate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from qurio_spark.functions.text import token_count
from qurio_spark.operators.textstats import quality_score_expr


def curate_corpus(
    docs: DataFrame,
    per_source_token_budget: int = 3000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, doc id, quality, n_tokens, cum_tokens) of the kept
    documents: per source, highest-quality first, while the running
    token total stays within budget.

    Stages (one job, two shuffles — dedup hash, then source window):
      1. exact dedup: row_number over sha256(text), keep lowest id;
      2. quality + token count: pure column expressions, map-side;
      3. budget: cumulative token sum over a window partitioned by
         source ordered by (quality desc, id asc); rows whose running
         total exceeds the budget fall away.
    """
    # quality/token/hash are all map-side column expressions: project
    # them in the scan and drop the text BEFORE the first exchange, so
    # both window shuffles move (hash, source, id, 2 scalars) instead
    # of the full document bodies
    prof0 = docs.select(
        F.col(source_col),
        F.col(id_col),
        F.sha2(F.col(text_col), 256).alias("_h"),
        quality_score_expr(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    prof = (
        prof0.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_h").orderBy(F.asc(id_col))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        prof.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= per_source_token_budget)
        .select(source_col, id_col, "quality", "n_tokens", "cum_tokens")
    )
