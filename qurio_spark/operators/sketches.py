"""Sketch aggregates — the sublinear-memory statistics a 100 TB
pipeline runs instead of exact forms.

Exact distinct counts and exact percentiles shuffle every distinct
value / sort every group; the sketch forms keep fixed-size state per
group and merge associatively (one partial-agg shuffle, no sort):

  - ``approx_count_distinct`` (HyperLogLog++): relative standard
    deviation ``rsd`` controls sketch size (~1.04/sqrt(m)).
  - ``approx_percentile`` (KLL-style quantile sketch): ``accuracy``
    controls rank error (err <= 1/accuracy).

Both are Spark built-ins (JVM-side, codegen); this module just fixes
the engine's default tolerances and pairs them with their exact twins
so tests can assert the error bounds hold (tests/test_sketches.py).
The exact twins stay the oracle-checked driver queries
(value_percentiles, stats_fanin) — sketches are intentionally
engine-specific, so they are bounds-tested, not hash-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default HLL relative standard deviation (Spark default 0.05)
DEFAULT_RSD = 0.02
#: default quantile-sketch accuracy (rank error <= 1/accuracy)
DEFAULT_ACCURACY = 10_000


def approx_user_stats(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    rsd: float = DEFAULT_RSD,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group sketch statistics: approx distinct users + approx
    median/p90 of the value column — fixed memory per group regardless
    of group size."""
    return events.groupBy(group_col).agg(
        F.approx_count_distinct(user_col, rsd=rsd).alias("approx_users"),
        F.percentile_approx(value_col, 0.5, accuracy).alias("approx_p50"),
        F.percentile_approx(value_col, 0.9, accuracy).alias("approx_p90"),
    )


def exact_user_stats(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The exact twin (for error-bound tests and small data)."""
    return events.groupBy(group_col).agg(
        F.countDistinct(user_col).alias("exact_users"),
        F.percentile(value_col, 0.5).alias("exact_p50"),
        F.percentile(value_col, 0.9).alias("exact_p90"),
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k_counters: int = 64,
    top: int = 10,
) -> DataFrame:
    """Misra-Gries heavy hitters -> (item, est_count, err_bound)
    ordered by estimate — the frequent-items sketch next to HLL and
    the quantile sketch.

    Why not groupBy-count?  Exact counting shuffles EVERY distinct
    item; with billions of distinct values (urls, tokens) the shuffle
    is the size of the dedup'd corpus.  Misra-Gries keeps
    ``k_counters`` counters per partition (classic frequent-items
    guarantee: per-summary undercount <= n_part/k); summaries are
    mergeable by adding counters, so the shuffle moves at most
    ``k_counters`` tiny rows per partition — fixed cost regardless of
    cardinality.

    The merged estimate undercounts by at most sum_p(n_p/k) <= n/k
    (``err_bound``, returned as a column so consumers can act on the
    guarantee): every item with true count > n/k is RETAINED, and
    est_count <= true_count <= est_count + err_bound.  Bounds are
    asserted against the exact twin in tests/test_sketches.py.

    Implementation: Arrow-batched ``mapInPandas`` runs the counter
    loop per partition (pure Python over a dict — the ONE shape
    column expressions cannot say, since counter eviction is
    sequential state), then a plain groupBy-sum over the tiny
    summaries.
    """
    if k_counters < 1:
        raise ValueError(f"k_counters must be >= 1, got {k_counters}")
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        n_seen = 0
        for pdf in batches:
            for v in pdf[item_col]:
                n_seen += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k_counters:
                    counters[v] = 1
                else:  # decrement-all (evict zeros): the MG step
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                # per-partition row count rides along (the None row)
                # so the driver can compute the global n/k bound
                "part_n": [0] * len(counters) + [n_seen],
            }
        )

    field = df.schema[item_col].dataType.simpleString()
    summaries = df.select(item_col).mapInPandas(
        mg, f"item {field}, cnt long, part_n long"
    )
    from qurio_spark.functions.checkpointing import checkpoint_df

    # Materialize the (tiny: <= k_counters+1 rows/partition) merged
    # summaries ONCE before both consumers: without the cut, the
    # .first() for the n/k bound and the returned frame would each
    # re-run the mapInPandas sketch — 2x compute, and a
    # nondeterministic upstream partitioning could make err_bound
    # disagree with the summaries actually backing est_count.
    merged = checkpoint_df(
        summaries.groupBy("item").agg(
            F.sum("cnt").alias("est_count"), F.sum("part_n").alias("_n")
        ),
        eager=True,
    )
    totals = merged.agg(F.sum("_n").alias("_total")).first()
    err = int(totals["_total"]) // k_counters if totals["_total"] else 0
    return (
        merged.filter(F.col("item").isNotNull())
        .select("item", "est_count", F.lit(err).alias("err_bound"))
        .orderBy(F.desc("est_count"), F.asc("item"))
        .limit(top)
    )
