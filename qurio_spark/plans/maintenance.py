"""Table maintenance: small-file compaction for partitioned stores.

Streaming/incremental ingest appends a file per micro-batch per
partition; after a few thousand batches a partition is thousands of
tiny files and every scan pays open/footer costs per file.  The fix is
periodic compaction — rewrite ONLY the partitions whose file count
exceeds a threshold, as one atomic dynamic-partition overwrite (the
same janitor-tick shape as the reference's stuck-page reset, M4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df


def small_file_partitions(
    path: str, partition_col: str, max_files: int
) -> list[str]:
    """Partition values whose directory holds more than ``max_files``
    parquet files.  Local-filesystem walk — in cloud deployments swap
    for a listing against the object-store catalog; the compaction
    logic is unchanged."""
    from urllib.parse import unquote

    out = []
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return out
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if d.startswith(prefix) and os.path.isdir(full):
            n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
            if n > max_files:
                # Spark URL-encodes partition values in directory names
                # (e.g. "a b" -> "a%20b"); the filter compares against
                # the DECODED column value
                out.append(unquote(d[len(prefix):]))
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "source_id",
    max_files: int = 1,
) -> int:
    """Rewrite fragmented partitions into one file each.  Returns the
    number of partitions compacted.

    Only fragmented partitions are read (the isin filter prunes
    directories) and only they are overwritten (dynamic partition
    overwrite); healthy partitions' files are untouched on disk.  The
    read is materialized (localCheckpoint) BEFORE the overwrite so the
    rewrite never races its own input."""
    values = small_file_partitions(path, partition_col, max_files)
    if not values:
        return 0
    fragmented = (
        spark.read.parquet(path)
        .filter(F.col(partition_col).isin(values))
        .repartition(partition_col)
        .transform(lambda d: checkpoint_df(d, eager=True))
    )
    (
        fragmented.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(values)
