"""Generic keyed MERGE (upsert) on plain parquet — Delta-`MERGE INTO`
semantics without a table format.

Semantics (per key in ``key_cols``):
  - matched  -> the update row REPLACES the target row
  - not matched -> the update row is INSERTED
  - target rows with no matching update are untouched

Scale design: with a ``partition_col`` the merge only reads and
rewrites the partitions the updates TOUCH — survivors = (affected
target rows) anti-join (update keys), union (updates), written back
with dynamic partition overwrite, so a 100 TB table with a 0.1% daily
update batch rewrites ~0.1% of its directories.  Without a partition
column the whole table rewrites (the honest cost of unpartitioned
MERGE — pick a partition key).

Self-overwrite: parquet refuses to overwrite a path that is also a
read source in the plan, so the survivor set is materialized through
the engine's checkpoint seam (functions/checkpointing.checkpoint_df,
eager) before the write — lineage-free blocks, no temp-dir dance, and
the durable-checkpoint switch makes the cut executor-loss-safe on a
real cluster.

Reference parity: this generalizes M1's delete-before-insert
(result_consumer.go:141-147, store.go:73-91) from the fixed
(sourceId, url) chunk key to any key set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str | None = None,
) -> None:
    """MERGE ``updates`` into the parquet table at ``path`` on
    ``key_cols`` (see module doc).  ``updates`` must carry the target's
    full schema; with ``partition_col``, an update may move a row
    across partitions only if its old partition also appears in the
    update batch (standard dynamic-overwrite caveat — otherwise the
    stale row in the untouched partition survives)."""
    key_cols = list(key_cols)
    target = spark.read.parquet(path)
    missing = set(target.columns) - set(updates.columns)
    if missing:
        raise ValueError(f"updates missing target columns: {sorted(missing)}")
    updates = updates.select(*target.columns)  # align column order

    if partition_col:
        parts = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        affected = target.filter(F.col(partition_col).isin(parts))
    else:
        affected = target
    survivors = affected.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = checkpoint_df(survivors.unionByName(updates), eager=True)

    writer = merged.write.mode("overwrite")
    if partition_col:
        writer = (
            merged.repartition(partition_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
        )
    writer.parquet(path)
