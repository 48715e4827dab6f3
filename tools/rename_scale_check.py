#!/usr/bin/env python
"""Scale-validate metadata-only RENAME COLUMN one decade above the
test SFs: a ~6M-row snapshot table (sf1 lineitem scale, 48 files)
renamed mid-history, then measure what the column-mapping design must
keep true at 100 TB:

  1. the rename commit itself is O(1) — milliseconds, zero data bytes
     moved (file mtimes pinned);
  2. the coalescing union-schema read costs ~nothing over the plain
     pinned read (full-table aggregate timed on both sides of the
     rename, median of 3);
  3. manifest stats pruning still prunes point scans to ~1 file of 48
     through the OLD files' old-name stats AND post-rename appends'
     new-name stats;
  4. a 1% key-band merge after the rename still carries the
     out-of-band files by name (the O(delta) DML claim survives the
     mapping).

Usage:  python tools/rename_scale_check.py [n_rows]

Prints one JSON line; the committed evidence lives in SCALE.md.
Deterministic input (spark.range); temp tables live under a tmpdir
and are removed on exit.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 48


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    from pyspark.sql import functions as F

    from qurio_spark.plans.snapshots import (
        _latest_version,
        _manifest_entries,
        _read_manifest,
        snap_append,
        snap_merge,
        snap_read,
        snap_rename_column,
        snap_scan_files,
    )
    from qurio_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="rename-scale-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="qurio-renamescale-")
    path = f"{work}/t"
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("okey"),
            (F.col("id") % 1000).cast("int").alias("grp"),
            (F.col("id") % 97 * 1.5).alias("price"),
        )
        .repartitionByRange(N_FILES, "okey")
    )
    snap_append(df, path)

    def read_agg_s():
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            snap_read(spark, path).agg(
                F.count("*"), F.sum("price")
            ).collect()
            reps.append(time.monotonic() - t0)
        return statistics.median(reps)

    pre_read_s = read_agg_s()

    files_before = {
        e["name"]: os.path.getmtime(os.path.join(path, e["name"]))
        for e in _manifest_entries(
            path, _read_manifest(path, _latest_version(path))
        )
    }
    t0 = time.monotonic()
    snap_rename_column(path, "okey", "order_id")
    rename_s = time.monotonic() - t0
    files_after = {
        name: os.path.getmtime(os.path.join(path, name))
        for name in files_before
    }
    bytes_moved = files_after != files_before

    # post-rename append under the NEW name (a second physical era)
    snap_append(
        spark.range(n, n + n // 100)
        .select(
            F.col("id").alias("order_id"),
            (F.col("id") % 1000).cast("int").alias("grp"),
            (F.col("id") % 97 * 1.5).alias("price"),
        )
        .coalesce(1),
        path,
    )

    # read must coalesce the renamed column across both eras — the
    # full-table aggregate now groups nothing out
    def read_agg_renamed_s():
        reps = []
        for _ in range(3):
            t0 = time.monotonic()
            got = snap_read(spark, path).agg(
                F.count("*").alias("n"), F.sum("order_id").alias("ksum")
            ).first()
            reps.append(time.monotonic() - t0)
        assert got["n"] == n + n // 100, got
        return statistics.median(reps)

    post_read_s = read_agg_renamed_s()

    # stats pruning through BOTH physical names
    n_total_files = len(
        _manifest_entries(path, _read_manifest(path, _latest_version(path)))
    )
    old_era_scan = snap_scan_files(
        path, {"order_id": (n // 2, n // 2 + 1000)}
    )
    new_era_scan = snap_scan_files(path, {"order_id": (n + 10, n + 20)})

    # 1% key-band merge AFTER the rename: out-of-band files carry
    lo, hi = n // 3, n // 3 + n // 100
    src = spark.range(lo, hi).select(
        F.col("id").alias("order_id"),
        F.lit(-1).cast("int").alias("grp"),
        F.lit(0.0).alias("price"),
    )
    pre_merge = {
        e["name"]: os.path.getmtime(os.path.join(path, e["name"]))
        for e in _manifest_entries(
            path, _read_manifest(path, _latest_version(path))
        )
    }
    t0 = time.monotonic()
    snap_merge(spark, path, src, ["order_id"])
    merge_s = time.monotonic() - t0
    kept = {
        e["name"]
        for e in _manifest_entries(
            path, _read_manifest(path, _latest_version(path))
        )
    }
    carried_untouched = sum(
        1
        for name, mt in pre_merge.items()
        if name in kept
        and os.path.getmtime(os.path.join(path, name)) == mt
    )

    out = {
        "n_rows": n,
        "n_files": n_total_files,
        "rename_s": round(rename_s, 4),
        "rename_moved_bytes": bool(bytes_moved),
        "read_s_pre_rename": round(pre_read_s, 2),
        "read_s_post_rename": round(post_read_s, 2),
        "scan_files_old_era_band": len(old_era_scan),
        "scan_files_new_era_band": len(new_era_scan),
        "merge_1pct_s": round(merge_s, 2),
        "merge_files_before": len(pre_merge),
        "merge_carried_untouched": carried_untouched,
        "ok": (
            not bytes_moved
            and rename_s < 1.0
            and post_read_s < 3 * max(pre_read_s, 0.2)
            and len(old_era_scan) <= 3
            and len(new_era_scan) <= 2
            and carried_untouched >= len(pre_merge) - 4
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
