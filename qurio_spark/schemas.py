"""Explicit StructType schemas for every engine table.

The reference manages schemas via SQL migrations (golang-migrate,
apps/backend/internal/app/bootstrap.go:52-66) plus a programmatically
created Weaviate class (internal/vector/schema.go:18-102).  No inference
anywhere — so the rebuild declares every table schema explicitly too.

Store mapping (SURVEY §1):
  Postgres `sources`       -> SOURCES        (catalog / control plane)
  Postgres `source_pages`  -> PAGES          (crawl frontier + ledger)
  Postgres `failed_jobs`   -> FAILED_ROWS    (dead-letter quarantine)
  Postgres `settings`      -> SETTINGS dict  (singleton runtime config)
  Weaviate `DocumentChunk` -> CHUNKS         (data plane, embedding col)
  NSQ result payload       -> DOCUMENTS_RAW  (ingestion input corpus)
  query JSONL log          -> QUERY_LOG
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- control plane -----------------------------------------------------------

# migrations/000001_init_schema.up.sql:1-9 + 000003,5,6,7,11
SOURCES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), True),  # 'web' | 'file'
        T.StructField("url", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),  # sha256(url)
        T.StructField("body_hash", T.StringType(), True),  # sha256(content)
        T.StructField("status", T.StringType(), True),  # pending/in_progress/completed/failed
        T.StructField("max_depth", T.IntegerType(), True),
        T.StructField("exclusions", T.ArrayType(T.StringType()), True),  # regex list
        T.StructField("deleted_at", T.TimestampType(), True),  # soft delete
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# migrations/000010_create_source_pages.up.sql:1-11
PAGES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("source_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),  # unique per (source_id, url)
        T.StructField("status", T.StringType(), True),  # pending/processing/completed/failed
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

# migrations/000009_create_failed_jobs.up.sql:1-9; features/job/job.go:8-17
FAILED_ROWS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("source_id", T.StringType(), True),
        T.StructField("handler", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),  # JSON of original task
        T.StructField("error", T.StringType(), True),
        T.StructField("retries", T.IntegerType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# migrations/000002_create_settings.up.sql + 000008; internal/settings/service.go:7-14.
# Singleton row -> a plain dict; defaults follow the reference (alpha 0.5;
# top_k standardized on 10, the MCP-documented default — mcp/handler.go:168).
DEFAULT_SETTINGS: dict = {
    "rerank_provider": "none",
    "search_alpha": 0.5,
    "search_top_k": 10,
}

# -- data plane --------------------------------------------------------------

# ingestion result payload (apps/ingestion-worker/main.py:182-193,
# handlers/file.py:249-258) — the corpus to clean/chunk/embed.
DOC_METADATA = T.StructType(
    [
        T.StructField("author", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),
        T.StructField("pages", T.IntegerType(), True),
        T.StructField("language", T.StringType(), True),
    ]
)

DOCUMENTS_RAW = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("path", T.StringType(), True),  # breadcrumb "a > b"
        T.StructField("content", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("status", T.StringType(), True),  # success | failed
        T.StructField("error", T.StringType(), True),
        T.StructField("metadata", DOC_METADATA, True),
    ]
)

# Weaviate DocumentChunk (internal/vector/schema.go:25-70) + worker.Chunk
# (internal/worker/types.go:7-20).  Partition key: source_id — every
# retrieval filter (F2), delete (F5) and re-ingest (M1) keys on it, so at
# 100 TB partition pruning makes those O(source) instead of O(corpus).
CHUNKS = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("source_name", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("type", T.StringType(), True),  # prose/code/api/config/cmd
        T.StructField("language", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),  # ISO date string
        T.StructField("page_count", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

# Chunker UDF element type (operators/chunker.py) — mirrors text.ChunkResult
# (internal/text/chunker.go:18-22).
CHUNK_RESULT = T.StructType(
    [
        T.StructField("content", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("language", T.StringType(), False),
    ]
)

# retrieval.SearchResult (internal/retrieval/service.go:10-23)
SEARCH_RESULT = T.StructType(
    [
        T.StructField("content", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("source_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("chunk_index", T.IntegerType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
    ]
)

# internal/retrieval/logger.go:13-58 JSONL query log
QUERY_LOG = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("query", T.StringType(), True),
        T.StructField("num_results", T.IntegerType(), True),
        T.StructField("latency_ms", T.DoubleType(), True),
    ]
)
