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
tiny relative to the corpus; each mutation lands one file —
``repartition(1)``, NOT ``coalesce(1)``: coalescing a LocalTableScan
to one partition measured ~4 s/write of pure overhead (it forces the
local rows through the legacy non-Arrow single-partition path), while
repartition keeps the Arrow conversion and costs one trivial shuffle
of human-scale rows.  The snapshot auto-compaction/vacuum tools apply
unchanged.

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
        return self.create_sources([row])[0]

    def create_sources(self, rows: list[dict]) -> list[bool]:
        """BULK dup-checked insert as ONE atomic commit — the batch
        shape (a crawl scheduler registering many discovered sources
        at once): N creates cost one snapshot commit, not N.  Returns
        per-row created flags; within the batch, later duplicates of
        an earlier row are rejected too.  An all-duplicate batch is a
        provable no-op and commits nothing (SnapNoChange).

        The dup check collects the live content hashes driver-side —
        the sources table is control-plane (human-scale) by contract,
        the same index lookup the reference's Postgres would do; the
        check re-runs on every claim attempt, so concurrent batches
        cannot double-insert a hash."""
        from qurio_spark.plans.snapshots import SnapNoChange

        flags: dict = {"v": [False] * len(rows)}

        def mutate(cur: DataFrame | None) -> DataFrame:
            base = cur if cur is not None else self.spark.createDataFrame([], SOURCES)
            live = {
                r["content_hash"]
                for r in base.filter(F.col("deleted_at").isNull())
                .select("content_hash")
                .collect()
            }
            out, fl = [], []
            for row in rows:
                if row["content_hash"] in live:
                    fl.append(False)
                else:
                    live.add(row["content_hash"])
                    out.append(tuple(row[f.name] for f in SOURCES.fields))
                    fl.append(True)
            flags["v"] = fl
            if not out:
                raise SnapNoChange()
            new = self.spark.createDataFrame(out, SOURCES)
            return base.unionByName(new).repartition(1)

        snap_mutate(self.spark, self.sources_path, mutate)
        return flags["v"]

    def soft_delete(self, source_id: str) -> None:
        snap_mutate(
            self.spark,
            self.sources_path,
            lambda cur: soft_delete_source(cur, source_id).repartition(1),
        )

    def update_statuses(self, status_by_id: DataFrame) -> None:
        snap_mutate(
            self.spark,
            self.sources_path,
            lambda cur: update_source_status(cur, status_by_id).repartition(1),
        )

    # -- quarantine (append-only) + retry bookkeeping -------------------

    def quarantine(self, docs: DataFrame, handler: str = "ingestion-worker") -> int:
        """Append this batch's failed rows as one atomic version."""
        rows = quarantine_failures(self.spark, docs, handler)
        return snap_append(rows.repartition(1), self.failed_path)

    def clear_retried(self, ids: list[str]) -> None:
        snap_mutate(
            self.spark,
            self.failed_path,
            lambda cur: clear_retried(cur, ids).repartition(1),
        )

    # -- query log (append-only) ----------------------------------------

    def log_queries(self, rows: list[tuple]) -> int:
        """rows: (ts, query, num_results, latency_ms) — one atomic
        append per flush (retrieval/logger.go's JSONL appends, with
        isolation)."""
        df = self.spark.createDataFrame(rows, QUERY_LOG)
        return snap_append(df.repartition(1), self.log_path)

    # -- stats fan-in ----------------------------------------------------

    def stats(self, chunks: DataFrame) -> dict:
        return {
            "sources": self.sources().filter(F.col("deleted_at").isNull()).count(),
            "documents": chunks.count(),
            "failed_jobs": self.failed_rows().count(),
        }
