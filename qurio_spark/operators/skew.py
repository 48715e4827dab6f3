"""Skew-mitigation utilities: salted aggregation and salted broadcast
join for heavy-hitter keys.

AQE's skew-join split (on in qurio_spark.session) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

  - ``salted_agg``: high-cardinality aggregations where ONE key owns a
    large share of rows (e.g. groupBy(url) over a crawl where a single
    host dominates).  Two-phase: aggregate on (key, salt) first — the
    hot key's rows spread over ``salt_n`` reducers — then re-aggregate
    on key.  Only works for decomposable aggregates (sum/count/min/max
    re-aggregate exactly).
  - ``salted_broadcast_left``: a large skewed fact joined to a dim too
    big for one broadcast slot but small enough to replicate: explode
    the dim ``salt_n`` ways and salt the fact uniformly so no reducer
    sees the whole hot key.  (With a genuinely small dim, plain
    ``F.broadcast`` is strictly better — this is for the middle case.)

Salts are deterministic (pmod of a hash), so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salt_n: int, out: str = "_salt") -> DataFrame:
    """Uniform deterministic salt in [0, salt_n) derived from the whole
    row's hash — spreads identical keys across ``salt_n`` buckets."""
    return df.withColumn(
        out, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable functions.

    ``aggs``: {column: fn} with fn in {sum, count, min, max}.  Phase 1
    aggregates on (keys + salt); phase 2 merges partials per key
    (count merges via sum).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in merge_fn:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = with_salt(df, salt_n)
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[getattr(F, fn)(c).alias(f"_p_{c}") for c, fn in aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_n: int = 8,
) -> DataFrame:
    """fact LEFT JOIN dim on ``on`` with the dim replicated salt_n ways
    and the fact salted uniformly — every (key, salt) partition holds
    1/salt_n of a hot key's rows."""
    dim_salted = dim.crossJoin(
        dim.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("_salt"))
    )
    fact_salted = with_salt(fact, salt_n)
    return fact_salted.join(F.broadcast(dim_salted), [on, "_salt"], "left").drop("_salt")


def salted_shuffle_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list | None = None,
    salt_n: int = 16,
    how: str = "inner",
    auto_top: int = 20,
    auto_counters: int = 256,
) -> DataFrame:
    """Targeted hot-key salting for a SHUFFLE join — the case neither
    ``F.broadcast`` nor ``salted_broadcast_left`` covers: both sides
    too big to broadcast/replicate wholesale, and a handful of keys own
    enough rows that one reducer becomes the stage's tail.

    Only HOT keys pay: hot left rows salt uniformly into ``salt_n``
    buckets, hot right rows replicate ``salt_n`` ways; every cold key
    keeps salt 0 on both sides — zero replication for the long tail
    (contrast: salting everything multiplies the whole right side).
    Each true pair still meets exactly once, so the result is
    IDENTICAL to ``left.join(right, on, how)`` (parity-tested).

    ``hot_keys=None`` detects them with the Misra-Gries sketch
    (operators/sketches.heavy_hitters) over the LEFT side's keys —
    fixed-size state, no exact pre-count — keeping keys whose
    estimated share exceeds what one reducer should hold.  At 100 TB
    this is the production loop: sketch once per input, salt only what
    the sketch flags.  (AQE's skew split does this at runtime for
    sort-merge joins; the explicit form also covers shuffled-hash
    joins, persists the decision, and works when AQE is off.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if hot_keys is None:
        from qurio_spark.operators.sketches import heavy_hitters

        hh = heavy_hitters(
            left.select(on), on, k_counters=auto_counters, top=auto_top
        ).collect()
        # a key is worth salting when its (under)estimated count alone
        # exceeds the error bound — i.e. it provably dominates n/k
        hot_keys = [r["item"] for r in hh if r["est_count"] > r["err_bound"]]
    if not hot_keys:
        return left.join(right, on, how)
    hot = [k for k in hot_keys]
    l = left.withColumn(
        "_salt",
        F.when(
            F.col(on).isin(hot),
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_n)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    r = right.withColumn(
        "_salts",
        F.when(
            F.col(on).isin(hot),
            F.sequence(F.lit(0), F.lit(salt_n - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("_salt", F.explode("_salts")).drop("_salts")
    return l.join(r, [on, "_salt"], how).drop("_salt")
