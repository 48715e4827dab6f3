"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Training-data-pipeline extension: weight every raw document by how
target-like it is, using hashed n-gram importance weights — the public
DSIR recipe selects pretraining data by estimating bag-of-hashed-ngram
distributions for a small TARGET corpus (the domain you want more of)
and the RAW pool, then scoring each raw document by the log-likelihood
ratio of its tokens under the two distributions.  The reference engine
has no data-selection machinery (SURVEY §2.7); this joins the curation
family (SURVEY §2.8) next to sample_mixture / weighted_sample /
gopher_rules / lm_quality.

Model: every token hashes into one of ``n_buckets`` buckets via the
engine-portable ``hash64`` (md5-top-60-bits — identical in Spark SQL,
DuckDB and Python, so the oracle reproduces scores bit-exactly).  With
add-one smoothing over bucket counts, a doc's log importance weight is

    ln w(doc) = sum over tokens of [ln p_target(b) - ln p_raw(b)]
              = sum_tok [ln(ct(b)+1) - ln(cq(b)+1)]
                + n_tokens * [ln(Tq + B) - ln(Tt + B)]

The per-token part is reported EXACTLY in integer milli-nats —
``logw_millinats = sum floor(1000 * (ln(ct+1) - ln(cq+1)))`` (ln over
exact integer counts only; order-invariant integer summation, the r12
rule) — alongside ``n_tokens`` so the caller can apply the constant
normalizer and resample (Gumbel top-k, or the deterministic
``top-n by (score, id)``).

Scale shape (100 TB posture): the two distribution estimates are
bounded groupBy counts over AT MOST ``n_buckets`` keys (map-side
partial agg absorbs token skew; the result is B rows no matter the
corpus size), the scoring join broadcasts those B-row tables, and the
only corpus-keyed shuffle is the final per-doc aggregation — the
corpus never shuffles on token/bucket keys, so hot buckets can't
concentrate on a reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.hashing import hash64
from qurio_spark.functions.text import tokenize


def _buckets(df: DataFrame, id_col: str, text_col: str, n_buckets: int,
             with_id: bool = True) -> DataFrame:
    """(id?, b): one row per token, hashed into its bucket.  Without
    ``with_id`` the id column is never touched, so a bare-text TARGET
    frame (no id column) works."""
    b = F.pmod(
        hash64(F.concat(F.lit("ds:"), F.col("w"))), F.lit(n_buckets)
    ).alias("b")
    if not with_id:
        return df.select(
            F.explode(tokenize(F.col(text_col))).alias("w")
        ).select(b)
    return df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("w")
    ).select(id_col, b)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document hashed-ngram importance scores ->
    ``(id_col, n_tokens, logw_millinats)``, exact integers (module
    doc).  Empty docs score ``(0, 0)``."""
    ct = (
        _buckets(target, id_col, text_col, n_buckets, with_id=False)
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    cq = (
        _buckets(raw, id_col, text_col, n_buckets, with_id=False)
        .groupBy("b")
        .agg(F.count("*").alias("cq"))
    )
    scored = (
        _buckets(raw, id_col, text_col, n_buckets)
        .join(F.broadcast(ct), ["b"], "left")
        .join(F.broadcast(cq), ["b"], "left")
        .select(
            id_col,
            F.floor(
                F.lit(1000.0)
                * (
                    F.log(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1))
                    - F.log(F.coalesce(F.col("cq"), F.lit(0)) + F.lit(1))
                )
            )
            .cast("long")
            .alias("_lw"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_lw").alias("logw_millinats"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logw_millinats", F.lit(0))
            .cast("long")
            .alias("logw_millinats"),
        )
    )
