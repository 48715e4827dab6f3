"""plans/catalog_store.py: control-plane state on snapshot tables —
atomic OCC mutations (no lost updates, dup checks that re-run under
races), time-travelable catalog history, append-only quarantine/log."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.catalog import new_source_row, retry_payloads
from qurio_spark.plans.catalog_store import SnapshotCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "catalog"))


def test_create_list_dup_and_soft_delete(spark, cat):
    assert cat.create_source(new_source_row("https://a.example")) is True
    assert cat.create_source(new_source_row("https://b.example")) is True
    # same url -> same content_hash -> dup rejected
    assert cat.create_source(new_source_row("https://a.example")) is False
    live = cat.list_sources().collect()
    assert sorted(r["url"] for r in live) == [
        "https://a.example", "https://b.example",
    ]
    a_id = next(r["id"] for r in live if r["url"] == "https://a.example")
    cat.soft_delete(a_id)
    assert [r["url"] for r in cat.list_sources().collect()] == [
        "https://b.example"
    ]
    # soft-deleted hash may be re-created (deleted_at IS NULL check)
    assert cat.create_source(new_source_row("https://a.example")) is True


def test_catalog_history_is_time_travelable(spark, cat):
    cat.create_source(new_source_row("https://a.example"))
    sid = cat.list_sources().collect()[0]["id"]
    cat.soft_delete(sid)
    v0 = cat.sources(version=0)
    assert v0.filter(F.col("deleted_at").isNull()).count() == 1
    assert cat.list_sources().count() == 0  # latest


def test_concurrent_same_hash_creates_insert_once(spark, cat):
    """The Postgres-transaction guarantee: two racing creates of the
    same content_hash -> exactly one insert (the dup check re-runs on
    every claim attempt)."""
    results = []

    def create():
        results.append(cat.create_source(new_source_row("https://race.example")))

    threads = [threading.Thread(target=create) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [False, True]
    assert cat.sources().filter(
        F.col("url") == "https://race.example"
    ).count() == 1


def test_concurrent_distinct_mutations_no_lost_update(spark, cat):
    """Two racing creates of DIFFERENT sources must both land — the
    loser's transform re-runs against the winner's table instead of
    overwriting it (the lost-update anomaly a blind overwrite retry
    would produce)."""
    def create(url):
        return lambda: cat.create_source(new_source_row(url))

    threads = [
        threading.Thread(target=create(f"https://s{i}.example"))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert cat.sources().count() == 4


def test_status_merge(spark, cat):
    cat.create_source(new_source_row("https://a.example"))
    sid = cat.list_sources().collect()[0]["id"]
    status = spark.createDataFrame(
        [(sid, "completed")], "source_id string, status string"
    )
    cat.update_statuses(status)
    assert cat.sources().collect()[0]["status"] == "completed"


def test_quarantine_retry_clear_roundtrip(spark, cat):
    docs = spark.createDataFrame(
        [
            ("s1", "u/ok", 0, "success", None),
            ("s1", "u/bad", 1, "failed", "ERR_TIMEOUT"),
            ("s2", "u/worse", 2, "failed", "ERR_CRAWL_HTTP"),
        ],
        "source_id string, url string, depth int, status string, error string",
    )
    cat.quarantine(docs)
    rows = cat.failed_rows().collect()
    assert len(rows) == 2
    payloads = retry_payloads(cat.failed_rows())
    assert sorted(p["url"] for p in payloads) == ["u/bad", "u/worse"]
    bad_id = next(r["id"] for r in rows if "u/bad" in r["payload"])
    cat.clear_retried([bad_id])
    left = cat.failed_rows().collect()
    assert len(left) == 1 and "u/worse" in left[0]["payload"]
    # clearing the last row leaves a valid EMPTY snapshot version
    cat.clear_retried([left[0]["id"]])
    assert cat.failed_rows().count() == 0
    assert cat.failed_rows().columns == [f.name for f in cat.failed_rows().schema]


def test_query_log_appends_atomically(spark, cat):
    from datetime import datetime

    t = datetime(2026, 1, 1, 12, 0, 0)
    cat.log_queries([(t, "hash join", 10, 12.5)])
    cat.log_queries([(t, "spark shuffle", 5, 8.0)])
    rows = cat.query_log().collect()
    assert sorted(r["query"] for r in rows) == ["hash join", "spark shuffle"]


def test_bulk_create_one_commit_and_no_churn(spark, cat):
    """N creates = ONE snapshot commit; an all-duplicate batch commits
    NOTHING (SnapNoChange) — no version churn from idempotent
    re-registration."""
    from qurio_spark.plans.snapshots import snap_versions

    rows = [new_source_row(f"https://b{i}.example") for i in range(5)]
    flags = cat.create_sources(rows)
    assert flags == [True] * 5
    assert len(snap_versions(cat.sources_path)) == 1  # one commit
    # in-batch duplicate: second copy of b0 rejected within the batch
    flags = cat.create_sources(
        [new_source_row("https://b9.example"),
         new_source_row("https://b0.example")]
    )
    assert flags == [True, False]
    assert len(snap_versions(cat.sources_path)) == 2
    # full replay: every row a duplicate -> provable no-op, no commit
    assert cat.create_sources(rows) == [False] * 5
    assert len(snap_versions(cat.sources_path)) == 2
    assert cat.sources().count() == 6
