"""Crawl-result JSONL source — the reference's NSQ payloads as files.

The reference's result consumer decodes exactly this JSON shape
(internal/worker/result_consumer.go:62-73): source_id, content, title,
path, url, status ('success'|'failed', omitted = success), error,
links[], depth, metadata{}.  A queue drain persisted as JSON-lines is
the natural Spark ingestion input, batch or streaming (the same schema
drives ``readStream`` for the foreachBatch pipeline).

Schema is EXPLICIT — ``inferSchema`` over 100 TB of JSON is a full
extra pass and schema drift becomes silent corruption; unknown fields
are dropped by the projection, missing ones land as NULLs and are
normalized to the DOCUMENTS_RAW defaults here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: result_consumer.go:62-73 (CorrelationID/OriginalPayload are queue
#: plumbing the engine does not need; metadata keeps the doc fields)
RESULT_PAYLOAD = T.StructType(
    [
        T.StructField("source_id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("depth", T.IntegerType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("author", T.StringType()),
                    T.StructField("created_at", T.StringType()),
                    T.StructField("pages", T.IntegerType()),
                    T.StructField("language", T.StringType()),
                ]
            ),
        ),
    ]
)


def _normalize(df: DataFrame) -> DataFrame:
    """Payload rows -> DOCUMENTS_RAW rows with the consumer's defaults
    (omitted status means success — result_consumer.go:67)."""
    return df.select(
        "source_id",
        "url",
        F.coalesce("title", F.lit("")).alias("title"),
        F.coalesce("path", F.lit("")).alias("path"),
        F.coalesce("content", F.lit("")).alias("content"),
        F.coalesce("links", F.array().cast("array<string>")).alias("links"),
        F.coalesce("depth", F.lit(0)).cast("int").alias("depth"),
        F.coalesce("status", F.lit("success")).alias("status"),
        F.col("error"),
        F.col("metadata"),
    )


def read_result_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL crawl results -> DOCUMENTS_RAW-shaped frame (batch)."""
    return _normalize(spark.read.schema(RESULT_PAYLOAD).json(path))


def stream_result_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin: the same payloads as a file-source stream, ready
    for streaming_ingest / streaming_ingest_incremental."""
    return _normalize(spark.readStream.schema(RESULT_PAYLOAD).json(path))
