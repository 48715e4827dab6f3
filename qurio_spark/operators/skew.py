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
