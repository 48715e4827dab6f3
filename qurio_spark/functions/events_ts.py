"""The events ``ts`` contract — schema-adaptive normalization and
timezone-free epoch math for the events table.

The generated events parquet has shipped BOTH as TIMESTAMP(NANOS) —
which Spark 4 refuses to read as a timestamp, so it arrives as
nanos-since-epoch long under ``spark.sql.legacy.parquet.nanosAsLong``
and needs conversion — and as plain timestamp[us] (TIMESTAMP_NTZ),
which needs none.  Round-4 lesson, institutionalized here: EVERY
events consumer (batch and streaming) must read through these helpers
rather than assuming one representation; two call sites that
hard-coded the nanos form broke when the parquet switched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Schema-adaptive ``ts`` normalization shared by EVERY events
    consumer (batch and streaming): nanos-since-epoch longs (the
    ``nanosAsLong`` representation) become microsecond timestamps;
    native timestamp columns pass through untouched."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV, not float /: ns-since-epoch exceeds double's
        # 53-bit mantissa, float division can drift truncation by 1us
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def epoch_secs(df: DataFrame, colname: str = "ts"):
    """Type-safe FLOOR-to-second epoch for the events ``ts`` timestamp,
    matching the oracle's ``epoch_ms(ts) // 1000`` exactly (sub-second
    components exist in the generated data, so floor-then-subtract, not
    subtract-then-truncate).

    ``cast("long")`` raises DATATYPE_MISMATCH on TIMESTAMP_NTZ, and
    every NTZ→LTZ coercion path — an explicit cast, but ALSO
    ``date_trunc`` and ``timestamp_diff``, which silently convert NTZ
    operands through the SESSION timezone (verified on Spark 4.1.2) —
    gives wrong answers for wall-clocks inside a DST gap on a stock
    session (the driver probes stock sessions).  The only truly
    timezone-free derivation is field extraction: days since epoch via
    date arithmetic plus hour/minute/second, which read the literal
    wall-clock fields.  The LTZ branch (legacy nanos parquet) keeps
    cast("long"), already an instant→epoch floor with no timezone
    involvement."""
    c = F.col(colname)
    if isinstance(df.schema[colname].dataType, T.TimestampNTZType):
        days = F.datediff(F.to_date(c), F.to_date(F.lit("1970-01-01")))
        return (
            days.cast("long") * 86400
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        )
    return c.cast("long")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a microsecond timestamp (see
    :func:`normalize_events_ts` for the schema-adaptive contract;
    DuckDB truncates NANOS to micros on cast, so both engines see
    identical values either way).

    Also pins the session timezone to UTC: ``date_trunc`` / ``window``
    / ``year`` silently coerce TIMESTAMP_NTZ through the session
    timezone, so on a stock session in a non-hour-aligned or DST zone
    every events consumer would diverge from the timezone-free DuckDB
    oracle.  Pinning here covers the whole family (they all read
    through this helper), the same way the nanosAsLong conf does."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
