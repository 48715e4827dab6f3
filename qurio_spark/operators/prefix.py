"""Distributed prefix sum — the scale-safe cumulative-sum primitive.

``Window.partitionBy(source).orderBy(key)`` cumsums (pack_shards,
pack_sequences) serialize each source through ONE reducer: a corpus
that is effectively a single source (the Common Crawl pretraining
shape) funnels every row through one task no matter how many executors
exist.  This module replaces that with the textbook two-pass
distributed prefix sum, expressed declaratively:

  1. *Range-bucket* every row by its order key against ``n_buckets-1``
     boundary keys sampled deterministically from the corpus (portable
     md5 hash filter — no RNG, stable across runs/partitionings).
  2. *Local pass*: running sum via a window over ``(part, bucket)`` —
     one corpus exchange, parallelism = sources x buckets.
  3. *Offset pass*: per-bucket totals via a map-side-partial groupBy
     (the exchange carries <= parts x buckets x tasks rows), a tiny
     per-part cumulative window over <= n_buckets rows per part
     computes each bucket's starting offset, and a broadcast join adds
     it back: ``cum = local_running + offset``.

Correctness never depends on the boundary sample.  With bucket(r) =
|{b in B : b <= r}|, transitivity of the engine's own total order
gives (i) monotonicity — r1 <= r2 implies bucket(r1) <= bucket(r2) —
and (ii) strictness across buckets — bucket(r1) < bucket(r2) implies
r1 < r2 — so per-bucket ranges never interleave and equal keys never
split across buckets, REGARDLESS of how B was chosen (a skewed sample
only unbalances task sizes).  The output is therefore bit-identical to
the single-window cumsum, and every oracle over it stays green.

Scale shape: one pruned count + one pruned sample scan over the order
key only (no token counting), one corpus exchange on (part, bucket)
for the running sums, and one tiny partial-agged exchange for the
totals.  The only serialized fraction is the offsets window:
<= n_buckets rows per part.

No reference counterpart (the reference has no windowed analytics at
all — SURVEY §2.7); this hardens the §2.8 curation/sharding extensions
for the 100-TB posture (VERDICT r13 next-round #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from qurio_spark.functions.hashing import hash64

#: how many order keys the boundary pass collects to the driver
SAMPLE_TARGET = 50_000
_MOD = 1_000_000


def order_key_boundaries(
    sample_df: DataFrame,
    order_col: str,
    n_buckets: int,
    sample_target: int = SAMPLE_TARGET,
) -> list:
    """Pick ``<= n_buckets - 1`` boundary keys that roughly equi-split
    the rows by ``order_col``.  Deterministic: the sample filter is the
    portable md5 hash mod 1e6 (same keys every run, every plan), not
    ``DataFrame.sample``'s partition-seeded RNG.  Both passes read ONLY
    the order-key column (column pruning keeps any expensive sibling
    columns, e.g. a tokenizer UDF, out of these scans)."""
    keys_df = sample_df.select(F.col(order_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    n = keys_df.count()
    if n == 0 or n_buckets <= 1:
        return []
    if n > sample_target:
        thresh = max(1, int(_MOD * sample_target / n))
        keys_df = keys_df.filter(
            F.pmod(hash64(F.col("_k").cast("string")), F.lit(_MOD))
            < F.lit(thresh)
        )
    keys = sorted({r["_k"] for r in keys_df.collect()})
    if len(keys) < 2:
        return []
    # evenly spaced interior quantile points, deduped (duplicates would
    # only create empty buckets, but there is no reason to keep them)
    pts = []
    for k in range(1, n_buckets):
        b = keys[(len(keys) * k) // n_buckets]
        if not pts or b != pts[-1]:
            pts.append(b)
    return pts


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    part_col: str,
    order_col: str,
    out_col: str,
    n_buckets: int | None = None,
    sample_df: DataFrame | None = None,
    sample_target: int = SAMPLE_TARGET,
    keep_bucket: str | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive running sum of ``value_col``
    within ``part_col`` in ``order_col`` order — the exact result of
    ``sum(value).over(partitionBy(part).orderBy(order))`` computed with
    parallelism ``parts x n_buckets`` instead of ``parts`` (module
    doc).  ``order_col`` must be unique within a part (same contract as
    the window form — ties would make any cumsum order-dependent).

    ``sample_df``: a cheaper frame to draw boundary keys from (e.g. the
    raw table before expensive derived columns); defaults to ``df``.
    ``n_buckets`` defaults to ``spark.sql.shuffle.partitions``.
    ``keep_bucket``: optionally expose the bucket id under this name
    (scale checks assert multi-bucket execution through it).
    """
    reserved = {"_psb", "_psrun", "_psoff", "_t", out_col}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"distributed_cumsum reserved columns in input: {clash}")
    if n_buckets is None:
        n_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    bounds = order_key_boundaries(
        sample_df if sample_df is not None else df,
        order_col,
        n_buckets,
        sample_target,
    )
    if not bounds:
        # degenerate input (tiny / single key): the plain window IS the
        # right plan
        w = (
            Window.partitionBy(part_col)
            .orderBy(F.asc(order_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = df.withColumn(out_col, F.sum(value_col).over(w))
        if keep_bucket:
            out = out.withColumn(keep_bucket, F.lit(0))
        return out

    # bucket(r) = |{b in B : b <= r}| as a plain sum of comparisons —
    # NOT a higher-order-function lambda: the offsets branch self-joins
    # this frame with its own aggregate, and NamedLambdaVariable
    # rebinding across the duplicated lineage trips
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at runtime (observed on 4.1)
    bucket = sum(
        (F.lit(b) <= F.col(order_col)).cast("int") for b in bounds
    )
    bucketed = df.withColumn("_psb", bucket)
    w_run = (
        Window.partitionBy(part_col, "_psb")
        .orderBy(F.asc(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_psrun", F.sum(value_col).over(w_run))

    # Per-bucket totals straight off the pre-window frame: map-side
    # partial aggregation collapses each bucket to one row per input
    # partition, so this exchange carries <= parts x buckets x tasks
    # rows — tiny.  (The probe and build branches scan the source
    # twice; the scans are embarrassingly parallel and the narrow
    # projection prunes everything but the three columns, so this is
    # the cheap half of the two-pass algorithm.  Callers with a very
    # expensive value expression can persist ``df`` first.)  Each
    # bucket's offset = sum of the totals of the buckets before it —
    # a window over <= n_buckets rows per part.
    btots = bucketed.groupBy(part_col, "_psb").agg(
        F.sum(value_col).alias("_t")
    )
    w_off = (
        Window.partitionBy(part_col)
        .orderBy(F.asc("_psb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btots.select(
        part_col,
        "_psb",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_psoff"),
    )
    out = (
        local.join(F.broadcast(offs), [part_col, "_psb"])
        .withColumn(out_col, F.col("_psrun") + F.col("_psoff"))
        .drop("_psrun", "_psoff")
    )
    if keep_bucket:
        out = out.withColumnRenamed("_psb", keep_bucket)
    else:
        out = out.drop("_psb")
    return out
