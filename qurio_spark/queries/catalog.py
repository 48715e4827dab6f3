"""Reference-parity relational queries (SURVEY §2.1/§2.2/§2.4):
source listing, metadata filters, pagination, stats fan-in, dedup
anti-join, page reconstruction."""

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

from qurio_spark.operators.pages import reconstruct_pages


def q_source_list(spark, sf_dir):
    """S7: catalog listing — group per source with counts (stand-in for
    sources scan + ORDER BY; hash compare is order-insensitive)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def q_filter_equality(spark, sf_dir):
    """F1/F2: AND of string-equality metadata filters pre-ranking."""
    return (
        _t(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("source") == "src1"))
        .select("doc_id", "source", "lang", "n_chars")
    )


def q_filter_offset(spark, sf_dir):
    """F4: filter + deterministic ORDER BY + LIMIT/OFFSET pagination."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .orderBy("event_id")
        .offset(50)
        .limit(100)
        .select("event_id", "user_id", stable_round("value", 4).alias("value"))
    )


def q_count_global(spark, sf_dir):
    """Q7: global chunk count."""
    return _t(spark, sf_dir, "documents").agg(F.count("*").alias("n"))


def q_count_filtered(spark, sf_dir):
    """Q8: filtered count (sourceId==X)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("source") == "src3")
        .agg(F.count("*").alias("n"))
    )


def q_stats_fanin(spark, sf_dir):
    """Q10: /stats — three independent counts fanned into one row."""
    d = _t(spark, sf_dir, "documents")
    ev = _events(spark, sf_dir)
    sources = d.agg(F.countDistinct("source").alias("n_sources"))
    docs = d.agg(F.count("*").alias("n_documents"))
    events = ev.agg(F.count("*").alias("n_events"))
    return sources.crossJoin(docs).crossJoin(events)


def q_dedup_anti_join(spark, sf_dir):
    """F6/F8: content-hash dedup of 'new' rows against 'existing' ones
    via left-anti join (new = doc_id >= 100, existing = doc_id < 100)."""
    d = _t(spark, sf_dir, "documents").withColumn("h", F.sha2("text", 256))
    new = d.filter(F.col("doc_id") >= 100)
    existing = d.filter(F.col("doc_id") < 100).select("h")
    return new.join(existing, "h", "left_anti").select("doc_id")


def q_read_page(spark, sf_dir):
    """Q5: page reconstruction — chunks of a page stitched in
    chunk_index order (store.go:311-405).  Here: docs of each source
    stitched in doc_id order."""
    return reconstruct_pages(
        _t(spark, sf_dir, "documents"),
        page_col="source",
        order_col="doc_id",
        content_col="text",
    )




def q_catalog_crud(spark, sf_dir):
    """M3/F6 CRUD e2e on the SNAPSHOT-BACKED catalog store (r10,
    plans/catalog_store.py): create one source per distinct
    documents.source (each duplicate re-create must be rejected by the
    content-hash dedup check), soft-delete 'src2', merge a 'completed'
    status for 'src1', then list the survivors.  Every mutation is an
    atomic OCC snapshot commit; the oracle reproduces the surviving
    list from ``documents`` directly (uuid ids / timestamps —
    nondeterministic — are excluded from the output)."""
    import tempfile

    from qurio_spark.operators.catalog import new_source_row
    from qurio_spark.plans.catalog_store import SnapshotCatalog

    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="catalog_crud_"))
    srcs = sorted(
        r["source"]
        for r in _t(spark, sf_dir, "documents").select("source").distinct().collect()
    )
    batch = [new_source_row(f"https://{s}.example", name=s) for s in srcs]
    created = cat.create_sources(batch)  # ONE commit for N creates
    # the whole batch re-sent: every row dup-rejected, nothing commits
    dups = cat.create_sources(
        [new_source_row(f"https://{s}.example", name=s) for s in srcs]
    )
    if not all(created) or any(dups):
        raise AssertionError("dedup-checked bulk create broken")
    # the ids were minted driver-side in new_source_row and every
    # create landed (asserted above), so the name->id map needs no
    # table re-read (r16, guide §5: the driver already holds it)
    rows = {r["name"]: r["id"] for r in batch}
    cat.soft_delete(rows["src2"])
    cat.update_statuses(
        spark.createDataFrame(
            [(rows["src1"], "completed")], "source_id string, status string"
        )
    )
    return cat.list_sources().select("name", "url", "status")
