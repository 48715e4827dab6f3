"""qurio_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of irahardianto/qurio, rebuilt Spark-first.

The reference system is a RAG "knowledge engine": document ingestion
(crawl / file convert) -> cleaning + structural chunking -> contextual
embedding -> hybrid retrieval (BM25 + vector, alpha-fused) -> rerank,
served over MCP.  This package re-expresses every operator of that
pipeline as declarative DataFrame programs so Catalyst/Tungsten pick the
physical strategy, and adds the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the reference lacks.

Layout:
    session     SparkSession bootstrap tuned for large clusters
    schemas     explicit StructType for every engine table
    functions/  column-expression libraries (text, hashing, vector, embedder)
    operators/  chunker, bm25, hybrid search, dedup, textstats, crawl, ...
    sources/    readers (parquet testdata, binary/multimodal plumbing)
    streaming/  Structured Streaming ingestion of the events stream
    plans/      end-to-end batch DAGs (ingest -> index -> search)
"""

from qurio_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
