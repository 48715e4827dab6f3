"""The events-ts contract imported FROM THE PACKAGE (not the entry
monolith) — the round-4 lesson must be reusable by any qurio_spark
consumer (VERDICT r5 item 3)."""

from pyspark.sql import functions as F

from qurio_spark.functions.events_ts import epoch_secs, normalize_events_ts


def test_normalize_nanos_long_to_timestamp(spark):
    df = spark.createDataFrame(
        [(1_710_037_800_500_000_123,)], "ts long"
    )
    out = normalize_events_ts(df)
    assert out.schema["ts"].dataType.typeName().startswith("timestamp")
    row = out.select(F.col("ts").cast("long").alias("s")).first()
    assert row["s"] == 1_710_037_800  # ns -> us floor, not float drift


def test_normalize_timestamp_passthrough(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts")
    )
    out = normalize_events_ts(df)
    assert out.schema["ts"].dataType == df.schema["ts"].dataType


def test_epoch_secs_ntz_timezone_free(spark):
    """Field-extraction derivation: as-if-UTC floor epochs under a DST
    session timezone (see tests/test_queries_full.py for the entry-side
    twin on stock sessions)."""
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.createDataFrame(
            [("2024-03-10 02:30:00.5",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        got = df.select(epoch_secs(df).alias("es")).first()["es"]
        assert got == 1710037800
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_entry_aliases_are_the_package_functions():
    import __spark_entry__ as entrymod

    assert entrymod._epoch_secs is epoch_secs
    assert entrymod._normalize_events_ts is normalize_events_ts
