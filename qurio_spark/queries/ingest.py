"""Ingestion-side queries on deterministic fixtures (S3, T7-T9, M1,
M4, M5, Q4): sitemap, md extract, meta normalization, re-ingest
upsert, streaming ingest, stuck reset, DLQ retry, rerank."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from qurio_spark.functions.frames import local_frame
from qurio_spark.functions.numeric import stable_round

from .common import (
    QUERY_TEXT,
    QUERY_VEC_ID,
    _docs_with_vecs,
    _epoch_secs,
    _events,
    _normalize_events_ts,
    _qvec,
    _t,
)



_SITEMAP_FIXTURE = [
    (
        "s1",
        "https://docs.example.com",
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://docs.example.com/a</loc></url>"
        "<url><loc> https://docs.example.com/b </loc></url>"
        "<url><loc>https://docs.example.com/a</loc></url>"
        "<url><loc>https://other.example.org/x</loc></url>"
        "</urlset>",
    ),
    (
        "s2",
        "https://api.example.org",
        "<urlset><url><loc>https://api.example.org/ref</loc></url>"
        "<url><loc>http://api.example.org:8080/alt</loc></url>"
        "<url><loc>nota url</loc></url></urlset>",
    ),
]

_MD_FIXTURE = [
    (
        "d1",
        "# Getting Started\n\nSee [the guide](https://ex.com/guide) and"
        " [API](/api).\n## Sub\n[dup](/api) end",
    ),
    ("d2", "Intro text first\n\n# Real Title\n[link one](https://ex.com/one)"),
    ("d3", "# Only Title\nplain [rel](../up) text [empty]()"),
]

_META_FIXTURE = [
    # (path, title, authors, created, pages, language)
    ("/up/a1b2.pdf", "Spark Internals", ["Ada", "Lin"], "2024-01-02", 12, "de"),
    ("/up/notes.md", None, [], None, 0, None),
    ("/up/guide-final.docx", "", ["Sol"], "2023-07-09", 0, "id"),
]

_STUCK_NOW = 1_700_000_000  # fixed "janitor tick" epoch second
_STUCK_FIXTURE = [
    # (source_id, url, status, updated_epoch)
    ("s1", "https://a.com/1", "processing", _STUCK_NOW - 400),
    ("s1", "https://a.com/2", "processing", _STUCK_NOW - 100),
    ("s1", "https://a.com/3", "pending", _STUCK_NOW - 4000),
    ("s2", "https://b.com/1", "completed", _STUCK_NOW - 4000),
]

_DLQ_FIXTURE = [
    # (id, handler, payload_json, error, retries)
    ("j1", "result-consumer", '{"type": "web", "url": "https://a.com"}', "timeout", 1),
    ("j2", "result-consumer", '{"type": "file", "path": "/up/x.pdf"}', "bad parse", 0),
    ("j3", "embedder", '{"type": "web", "url": "https://b.com"}', "quota", 3),
]

_TYPE_RE = '"type"\\s*:\\s*"([^"]+)"'


def q_sitemap_urls(spark, sf_dir):
    """S3: urlset parse + same-domain filter + dedup as one DataFrame
    chain (regexp_extract_all + explode; sitemap.py:192-306 semantics).
    Index recursion is the driver loop in sources/sitemap.py (tested in
    tests/test_sitemap.py)."""
    from qurio_spark.sources.sitemap import sitemap_page_urls

    df = local_frame(spark, 
        _SITEMAP_FIXTURE, "source_id string, base_url string, xml string"
    )
    return sitemap_page_urls(df)


def q_md_extract(spark, sf_dir):
    """T7: markdown link + title extraction (web.py:138-181): links via
    the []( ) regex, distinct per doc; title = first level-1 heading."""
    md = local_frame(spark, _MD_FIXTURE, "doc_id string, content string")
    return (
        md.select(
            "doc_id",
            F.regexp_extract("content", r"(?m)^# (.+)$", 1).alias("title"),
            F.explode(
                F.regexp_extract_all(
                    "content", F.lit(r"\[[^\]]*\]\(([^)]*)\)"), F.lit(1)
                )
            ).alias("link"),
        )
        .distinct()
    )


def q_content_hash(spark, sf_dir):
    """T8: sha256 identity + body hashes (source.go:96-98,
    result_consumer.go:195-198) — pure built-in sha2, no UDF."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.concat(F.lit("doc://"), F.col("doc_id").cast("string")), 256).alias(
            "url_hash"
        ),
        F.sha2(F.col("text"), 256).alias("body_hash"),
    )


def q_doc_meta_norm(spark, sf_dir):
    """T9: docling metadata normalization (file.py:66-141): title
    metadata > filename-from-path; author list joined ", "; language
    default en; pages kept (0 = unknown)."""
    rows = local_frame(spark, 
        _META_FIXTURE,
        "path string, title string, authors array<string>, created string,"
        " pages int, language string",
    )
    basename = F.regexp_extract("path", r"([^/]+)$", 1)
    return rows.select(
        "path",
        F.coalesce(F.nullif("title", F.lit("")), basename).alias("title"),
        F.coalesce(F.array_join("authors", ", "), F.lit("")).alias("author"),
        F.coalesce("created", F.lit("")).alias("created_at"),
        F.coalesce("pages", F.lit(0)).alias("page_count"),
        F.coalesce(F.nullif("language", F.lit("")), F.lit("en")).alias("language"),
    )


def q_reingest_upsert(spark, sf_dir):
    """M1: idempotent re-ingest — delete-before-insert expressed as
    anti-join(old, recrawled-keys) UNION new rows
    (result_consumer.go:141-147; at scale: dynamic partition
    overwrite, see plans/pipeline.write_chunks)."""
    d = _t(spark, sf_dir, "documents")
    old = d.select("doc_id", "source", F.sha2(F.col("text"), 256).alias("body_hash"))
    recrawled = (
        d.filter(F.col("source") == "src2")
        .select(
            "doc_id",
            "source",
            F.sha2(F.concat(F.col("text"), F.lit("-v2")), 256).alias("body_hash"),
        )
    )
    return old.join(recrawled.select("doc_id"), "doc_id", "left_anti").unionByName(
        recrawled
    )


def q_merge_orders(spark, sf_dir):
    """Generic keyed MERGE (plans/merge.merge_upsert, Delta-MERGE
    semantics on plain parquet): a REAL round-trip — orders is copied
    to a scratch table partitioned by o_orderpriority, an update batch
    (repriced existing keys + brand-new keys) is merged with dynamic
    partition overwrite, and the table is read BACK from disk for the
    per-priority rollup the oracle reconstructs relationally."""
    import tempfile

    from qurio_spark.plans.merge import merge_upsert

    o = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="qurio-merge-orders-") + "/orders"
    o.repartition("o_orderpriority").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(path)

    repriced = o.filter(F.col("o_orderkey") % 50 == 0).withColumn(
        "o_totalprice", stable_round(F.col("o_totalprice") * 1.1, 2)
    )
    inserted = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    merge_upsert(
        spark,
        path,
        repriced.unionByName(inserted),
        key_cols=["o_orderkey"],
        partition_col="o_orderpriority",
    )
    merged = spark.read.parquet(path)
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.sum((F.col("o_orderkey") >= 10_000_000).cast("int")).alias(
            "n_inserted"
        ),
    )


def q_reingest_skip_unchanged(spark, sf_dir):
    """M1 + body_hash change detection (result_consumer.go:195-198
    records the hash; SURVEY §4 calls the compare a cheap win): a
    recrawl fetched src2 (content changed) and src3 (content
    identical).  Unchanged pages are SKIPPED (no re-chunk/re-embed, no
    rewrite), changed pages are rewritten, everything else kept
    (plans/pipeline.split_unchanged)."""
    from qurio_spark.plans.pipeline import split_unchanged

    d = _t(spark, sf_dir, "documents")
    prior = d.select("doc_id", "source", F.sha2("text", 256).alias("body_hash"))
    recrawl = d.filter(F.col("source").isin("src2", "src3")).select(
        "doc_id",
        "source",
        F.when(
            F.col("source") == "src2", F.concat(F.col("text"), F.lit("-v2"))
        )
        .otherwise(F.col("text"))
        .alias("content"),
    )
    changed, unchanged = split_unchanged(
        recrawl, prior, url_col="doc_id", content_col="content"
    )
    kept = (
        prior.join(recrawl.select("doc_id"), "doc_id", "left_anti")
        .withColumn("action", F.lit("kept"))
    )
    skipped = (
        prior.join(unchanged.select("doc_id"), "doc_id", "left_semi")
        .withColumn("action", F.lit("skipped_unchanged"))
    )
    rewritten = changed.select(
        "doc_id", "source", "body_hash", F.lit("rewritten").alias("action")
    )
    return kept.unionByName(skipped).unionByName(rewritten)


def q_streaming_near_dedup(spark, sf_dir):
    """Cross-batch near-dup gate driven by REAL Structured Streaming:
    the documents table replays as two id-ordered availableNow rounds
    through ``streaming_near_dup_dedup`` (4-perm portable signatures,
    threshold 1.0).  At threshold 1.0 the LSH match degenerates to
    signature EQUALITY — an equivalence relation — so the full replay's
    accepted set is exactly "min doc_id per signature class", which is
    what the SQL oracle computes; id-ordered batches make the greedy
    cross-batch suppression agree with that global minimum."""
    import tempfile

    from qurio_spark.streaming.ingest import (
        streaming_near_dup_dedup,
        streaming_state_partitions,
    )

    base = tempfile.mkdtemp(prefix="qurio-stream-neardup-")
    in_dir = f"{base}/in"
    acc, store, ckpt = f"{base}/accepted", f"{base}/store", f"{base}/ckpt"

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mid = d.agg(F.max("doc_id")).first()[0] // 2

    def run(batch_df):
        # stage the replay input as ONE file (it is ~2.5k rows): 32
        # task-sized shards would make every later micro-batch re-list
        # and re-open 32 tiny files
        batch_df.coalesce(1).write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(batch_df.schema).parquet(in_dir)
        q = streaming_near_dup_dedup(
            stream, acc, store, ckpt, num_perm=4, bands=2, threshold=1.0
        ).start()
        q.awaitTermination()

    # bounded replay: size the micro-batch shuffles to the input, not
    # the CPU count (see streaming_state_partitions)
    with streaming_state_partitions(spark, 8):
        run(d.filter(F.col("doc_id") <= mid))
        run(d.filter(F.col("doc_id") > mid))
    return spark.read.parquet(acc).select("doc_id")


def q_streaming_ingest(spark, sf_dir):
    """M7 as a hard signal: the foreachBatch incremental ingest
    (streaming/ingest.streaming_ingest_incremental) driven by REAL
    Structured Streaming — two availableNow runs over a file source
    sharing one checkpoint, so the second run processes exactly the
    newly-arrived files as its own micro-batch(es).

    Batch 1: pages p0..p39.  Batch 2: p0..p19 re-crawled with changed
    bodies (rewritten via dynamic partition overwrite), p20..p39 resent
    byte-identical (skipped by the body-hash ledger), p40..p49 new.
    Returns the FINAL chunks table joined with the final ledger —
    both persisted-state tables after the second micro-batch."""
    import tempfile

    from qurio_spark.streaming.ingest import (
        streaming_ingest_incremental,
        streaming_state_partitions,
    )

    base = tempfile.mkdtemp(prefix="qurio-stream-ingest-")
    in_dir = f"{base}/in"
    chunks_p, ledger_p, ckpt = f"{base}/chunks", f"{base}/ledger", f"{base}/ckpt"

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")

    def pages(pred, updated):
        content = F.concat(
            F.lit("Doc "), F.col("doc_id"), F.lit(" alpha beta gamma delta.")
        )
        if updated:
            content = F.concat(content, F.lit(" updated"))
        return d.filter(pred).select(
            F.concat(F.lit("https://ex.com/p"), F.col("doc_id")).alias("url"),
            F.col("source").alias("source_id"),
            F.lit("success").alias("status"),
            content.alias("content"),
            F.concat(F.lit("Page "), F.col("doc_id")).alias("title"),
            F.concat(F.lit("/p"), F.col("doc_id")).alias("path"),
            F.struct(
                F.lit("qurio").alias("author"),
                F.lit("2024-01-01").alias("created_at"),
                F.lit(0).alias("pages"),
            ).alias("metadata"),
        )

    b1 = pages(F.col("doc_id") < 40, updated=False)
    b2 = pages(F.col("doc_id") < 20, updated=True).unionByName(
        pages((F.col("doc_id") >= 20) & (F.col("doc_id") < 50), updated=False)
    )
    schema = b1.schema

    def run_available(batch_df):
        # one staged file per replay round (40-50 rows) — see the
        # near-dedup twin for the listing rationale
        batch_df.coalesce(1).write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = streaming_ingest_incremental(stream, chunks_p, ledger_p, ckpt).start()
        q.awaitTermination()

    # bounded replay: size the micro-batch shuffles to the input, not
    # the CPU count (see streaming_state_partitions)
    with streaming_state_partitions(spark, 8):
        run_available(b1)
        run_available(b2)

    from qurio_spark.plans.snapshots import snap_read

    chunks = snap_read(spark, chunks_p).select(
        "url", "source_id", "chunk_index", "content", "title"
    )
    ledger = snap_read(spark, ledger_p)
    return chunks.join(ledger, "url")


def q_stuck_reset(spark, sf_dir):
    """M4 janitor: 'processing' rows older than 5 min flip back to
    'pending' (source/repo.go:183-195; ticker main.go:109-123)."""
    import datetime

    from qurio_spark.operators.crawl import reset_stuck_pages

    pages = local_frame(spark, 
        _STUCK_FIXTURE, "source_id string, url string, status string, updated_epoch long"
    ).withColumn("updated_at", F.timestamp_seconds(F.col("updated_epoch")))
    now = datetime.datetime.fromtimestamp(_STUCK_NOW, tz=datetime.timezone.utc)
    return reset_stuck_pages(pages, now).select("source_id", "url", "status")


def q_dlq_retry(spark, sf_dir):
    """M5: DLQ replay routing — payload type -> original topic, retry
    budget max 3 (job/service.go:31-80, config.py:17-20)."""
    jobs = local_frame(spark, 
        _DLQ_FIXTURE,
        "id string, handler string, payload string, error string, retries int",
    )
    ptype = F.regexp_extract("payload", _TYPE_RE, 1)
    return (
        jobs.filter(F.col("retries") < 3)
        .select(
            "id",
            F.when(ptype == "file", F.lit("ingest.task.file"))
            .otherwise(F.lit("ingest.task.web"))
            .alias("topic"),
            (F.col("retries") + 1).alias("retries"),
        )
    )


def q_rerank_overlap(spark, sf_dir):
    """Q4: deterministic local rerank — candidate top-20 from the
    'retrieval' ordering re-scored by query-term overlap, reordered,
    top-10 (retrieval/service.go:112-133 with the provider swapped for
    the hermetic overlap scorer in operators/rerank.py)."""
    d = _t(spark, sf_dir, "documents")
    cand = (
        d.filter(F.col("source") == "src1")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(20)
    )
    low = F.lower(F.col("text"))
    overlap = sum(
        F.when(low.rlike(f"(^|[^a-z0-9]){t}([^a-z0-9]|$)"), 1).otherwise(0)
        for t in QUERY_TEXT.split()
    )
    return (
        cand.withColumn("rerank_score", overlap.cast("int"))
        .orderBy(F.desc("rerank_score"), "doc_id")
        .limit(10)
        .select("doc_id", "rerank_score")
    )


