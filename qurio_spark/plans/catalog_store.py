"""Snapshot-backed catalog store — the control plane (sources CRUD +
status machine M3, failed-row quarantine M5, query log Q11, stats Q10)
persisted on snapshot tables instead of caller-managed parquet.

The reference keeps this state in Postgres, where every mutation is a
transaction: concurrent creates can't both pass the dup check, a
status merge never clobbers a concurrent soft-delete, and readers see
committed states only.  The pure DataFrame transforms in
``operators/catalog.py`` preserved the SEMANTICS but left persistence
to the caller — plain parquet rewrites have none of those guarantees.
This module closes that gap by routing every mutation through the
snapshot layer (plans/snapshots.py):

  - read-modify-write mutations (create with dup check, soft delete,
    status merge, clear-retried) run under :func:`snap_mutate` — true
    optimistic concurrency, the transform RE-RUNS when a concurrent
    commit wins (no lost updates, pinned by a two-writer test);
  - append-only streams (quarantined failures, query log) use
    ``snap_append`` — one atomic version per batch;
  - every table is time-travelable (catalog history for free) and
    readers are manifest-pinned (no torn reads during a mutation).

The row/filter logic stays in ``operators/catalog.py`` — this module
owns ONLY persistence, so the two cannot drift.  Control tables are
tiny relative to the corpus; each mutation coalesces to one file and
the snapshot auto-compaction/vacuum tools apply unchanged.

Reference parity: source/source.go:96-112 (dup-checked create),
source/repo.go:40-57 (list), features/job/job.go:8-17 (quarantine +
retry), retrieval/logger.go:13-58 (query log).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from qurio_spark.operators.catalog import (
    clear_retried,
    list_sources,
    quarantine_failures,
    soft_delete_source,
    update_source_status,
)
from qurio_spark.plans.snapshots import (
    snap_append,
    snap_mutate,
    snap_read,
    snap_read_if_exists,
)
from qurio_spark.schemas import FAILED_ROWS, QUERY_LOG, SOURCES


class SnapshotCatalog:
    """Control-plane state under ``root/{sources,failed_rows,
    query_log}`` as snapshot tables.  All reads are manifest-pinned;
    all mutations are atomic OCC commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.sources_path = os.path.join(root, "sources")
        self.failed_path = os.path.join(root, "failed_rows")
        self.log_path = os.path.join(root, "query_log")

    # -- reads ---------------------------------------------------------

    def sources(self, version: int | None = None) -> DataFrame:
        df = (
            snap_read(self.spark, self.sources_path, version)
            if version is not None
            else snap_read_if_exists(self.spark, self.sources_path)
        )
        if df is None:
            return self.spark.createDataFrame([], SOURCES)
        return df

    def failed_rows(self) -> DataFrame:
        df = snap_read_if_exists(self.spark, self.failed_path)
        return df if df is not None else self.spark.createDataFrame([], FAILED_ROWS)

    def query_log(self) -> DataFrame:
        df = snap_read_if_exists(self.spark, self.log_path)
        return df if df is not None else self.spark.createDataFrame([], QUERY_LOG)

    def list_sources(self) -> DataFrame:
        return list_sources(self.sources())

    # -- source mutations (read-modify-write under OCC) -----------------

    def create_source(self, row: dict) -> bool:
        """Dup-checked insert as ONE atomic commit: the EXISTS check
        re-runs on every claim attempt, so two concurrent creates of
        the same content_hash cannot both insert (the Postgres-
        transaction guarantee the plain-parquet form lacked)."""
        created = {"v": False}

        def mutate(cur: DataFrame | None) -> DataFrame:
            base = cur if cur is not None else self.spark.createDataFrame([], SOURCES)
            dup = (
                base.filter(
                    (F.col("content_hash") == row["content_hash"])
                    & F.col("deleted_at").isNull()
                )
                .limit(1)
                .count()
                > 0
            )
            created["v"] = not dup
            if dup:
                return base.coalesce(1)
            new = self.spark.createDataFrame(
                [tuple(row[f.name] for f in SOURCES.fields)], SOURCES
            )
            return base.unionByName(new).coalesce(1)

        snap_mutate(self.spark, self.sources_path, mutate)
        return created["v"]

    def soft_delete(self, source_id: str) -> None:
        snap_mutate(
            self.spark,
            self.sources_path,
            lambda cur: soft_delete_source(cur, source_id).coalesce(1),
        )

    def update_statuses(self, status_by_id: DataFrame) -> None:
        snap_mutate(
            self.spark,
            self.sources_path,
            lambda cur: update_source_status(cur, status_by_id).coalesce(1),
        )

    # -- quarantine (append-only) + retry bookkeeping -------------------

    def quarantine(self, docs: DataFrame, handler: str = "ingestion-worker") -> int:
        """Append this batch's failed rows as one atomic version."""
        rows = quarantine_failures(self.spark, docs, handler)
        return snap_append(rows.coalesce(1), self.failed_path)

    def clear_retried(self, ids: list[str]) -> None:
        snap_mutate(
            self.spark,
            self.failed_path,
            lambda cur: clear_retried(cur, ids).coalesce(1),
        )

    # -- query log (append-only) ----------------------------------------

    def log_queries(self, rows: list[tuple]) -> int:
        """rows: (ts, query, num_results, latency_ms) — one atomic
        append per flush (retrieval/logger.go's JSONL appends, with
        isolation)."""
        df = self.spark.createDataFrame(rows, QUERY_LOG)
        return snap_append(df.coalesce(1), self.log_path)

    # -- stats fan-in ----------------------------------------------------

    def stats(self, chunks: DataFrame) -> dict:
        return {
            "sources": self.sources().filter(F.col("deleted_at").isNull()).count(),
            "documents": chunks.count(),
            "failed_jobs": self.failed_rows().count(),
        }
