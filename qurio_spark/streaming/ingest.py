"""Structured Streaming surface.

The reference has no event-time streaming — NSQ is an at-least-once
work queue (SURVEY §1.3, §2.7) — so this module is the *extension*
surface: the events table treated as a stream, with the batch queries
in ``__spark_entry__`` (events_hourly etc.) as their exactly-equivalent
batch twins (same expressions, so batch output == final streaming
output — that equivalence is the test oracle, tests/test_streaming.py).

Patterns covered:
  - windowed aggregation with watermark (late-data bounded state)
  - streaming dedup by key + watermark (the streaming form of F8)
  - foreachBatch ingest: reuse the BATCH chunk pipeline per micro-batch
    — the Spark-native replacement for the reference's queue consumers
    (50-way NSQ handlers -> micro-batch task parallelism, M7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.plans.pipeline import build_chunks


def hourly_event_counts(
    events_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums with a late-data watermark.

    State stays bounded: windows older than the watermark are finalized
    and evicted — the 100 TB/day concern for a streaming agg.
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(
    events_stream: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: first occurrence per key wins; state
    bounded by the watermark (dropDuplicatesWithinWatermark)."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_ingest(
    docs_stream: DataFrame,
    chunks_path: str,
    checkpoint: str,
    embedder=None,
):
    """documents_raw as a stream -> chunk+embed per micro-batch ->
    append to the chunks table.  foreachBatch reuses the exact batch
    pipeline, so streaming and batch ingest cannot drift."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        chunks = build_chunks(batch_df, embedder)
        chunks.write.mode("append").partitionBy("source_id").parquet(chunks_path)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
