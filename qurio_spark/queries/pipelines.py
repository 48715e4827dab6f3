"""Non-SQL-expressible / composite queries: full ingest pipeline,
iterative k-means (IVF codebook), chunker corpus, LSH top-k twins."""

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

from qurio_spark.operators.chunker import chunk_documents
from qurio_spark.operators.similarity import lsh_topk

from .search import (
    _LSH_INDEX_HANDLES,
    _lsh_index_path,
)


def q_ingest_pipeline(spark, sf_dir):
    """T1-T6 end-to-end: clean -> chunk -> contextual prefix -> embed
    (hashing-TF pandas UDF).  Returns chunk rows with the embedding
    dimension as a checkable column (vectors themselves are rows-only)."""
    from qurio_spark.plans.pipeline import build_chunks

    d = _t(spark, sf_dir, "documents")
    docs_raw = d.select(
        F.col("source").alias("source_id"),
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("").alias("title"),
        F.lit("").alias("path"),
        F.col("text").alias("content"),
        F.array().cast("array<string>").alias("links"),
        F.lit(0).alias("depth"),
        F.lit("success").alias("status"),
        F.lit(None).cast("string").alias("error"),
        F.lit(None).cast(
            "struct<author:string,created_at:string,pages:int,language:string>"
        ).alias("metadata"),
    )
    chunks = build_chunks(docs_raw)
    return chunks.select(
        "source_id", "url", "chunk_index", "type", F.size("embedding").alias("dim")
    )


def q_kmeans_ivf(spark, sf_dir):
    """IVF index build: distributed Lloyd's k-means codebook + corpus
    labeling (operators/similarity.ivf_build).  Iterative -> rows-only
    check; clustering quality is asserted in tests/test_dedup.py."""
    from qurio_spark.operators.similarity import ivf_build

    emb = _t(spark, sf_dir, "embeddings")
    labeled, _centroids = ivf_build(emb, k=8, iters=3)
    return labeled.groupBy("label").agg(F.count("*").alias("n_vecs"))


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN with exact refine (operators/pq.py):
    fit per-subspace codebooks on the deterministic hash sample,
    encode the corpus to m=16 4-bit-sized codes, ADC-score a
    shortlist of 100 over the compressed table, then exactly re-score
    only the shortlist (broadcast semi-join).  Oracle-backed because
    the committed config's shortlist recall is 1.0 on this corpus
    (pinned in tests/test_pq.py), so the refined top-10 IS the exact
    dot top-10 — at 100 TB the same plan scans ~40x fewer bytes than
    the dense scorer."""
    from qurio_spark.operators.pq import pq_encode, pq_fit, pq_topk_refined

    emb = _t(spark, sf_dir, "embeddings")
    q = _qvec(spark, sf_dir)
    books = pq_fit(emb, m=16, k=16, iters=10)
    codes = pq_encode(emb, books)
    top = pq_topk_refined(codes, emb, books, q, topk=10, shortlist=100)
    return top.select("vec_id", stable_round("score", 4).alias("score"))


def q_chunk_corpus(spark, sf_dir):
    """T1-T4 + F9/F10: structural chunker over the documents corpus."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("content")
    )
    return chunk_documents(d)


def q_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN probe (approximate; checked
    rows-only — the exact twin is q_vector_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    top = lsh_topk(emb, _qvec(spark, sf_dir), n_planes=3, k=10)
    return top.select("vec_id", stable_round("score", 4).alias("score"))


def q_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH against the persisted bucket index: the query's
    bucket plus its lowest-|margin| neighbor bucket (2 of 2^3
    directories read) — the standard recall/latency dial for hyperplane
    LSH, with the probe set still a driver-side literal so directory
    pruning holds (operators/similarity.lsh_probe_buckets)."""
    from qurio_spark.operators.similarity import lsh_topk_prebuilt, read_lsh_index

    idx = _LSH_INDEX_HANDLES.get(sf_dir)
    if idx is None:
        idx = read_lsh_index(spark, _lsh_index_path(spark, sf_dir))
        _LSH_INDEX_HANDLES[sf_dir] = idx
    top = lsh_topk_prebuilt(idx, _qvec(spark, sf_dir), k=10, n_probe_buckets=2)
    return top.select("vec_id", stable_round("score", 4).alias("score"))


def q_lsh_prebuilt(spark, sf_dir):
    """q_lsh_topk against the PERSISTED bucket index: corpus written
    partitioned by sign-pattern bucket, query hashed to its bucket
    driver-side, so the scan prunes to ONE of 2^n_planes directories —
    zero per-query corpus passes (operators/similarity.write_lsh_index /
    lsh_topk_prebuilt; same write-time layout as BM25 term buckets and
    IVF labels)."""
    from qurio_spark.operators.similarity import lsh_topk_prebuilt, read_lsh_index

    idx = _LSH_INDEX_HANDLES.get(sf_dir)
    if idx is None:
        idx = read_lsh_index(spark, _lsh_index_path(spark, sf_dir))
        _LSH_INDEX_HANDLES[sf_dir] = idx
    top = lsh_topk_prebuilt(idx, _qvec(spark, sf_dir), k=10)
    return top.select("vec_id", stable_round("score", 4).alias("score"))


