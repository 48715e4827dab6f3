#!/usr/bin/env python
"""Scale-validate the EVICTING sessionizer one decade above the test
SFs (VERDICT r11 #4): the r11 claim is "state scales with
|users active within one gap of the watermark|, not |all users ever
seen|" — this check drives ~1M distinct users through
``sessionize_stream_evicting`` in MANY availableNow micro-batches and
asserts the two properties the claim rests on:

  1. STATE EVICTION — the state store's row count (per-batch
     ``stateOperators[0].numRowsTotal`` from StreamingQueryProgress)
     stays bounded by the active wave, never accumulating toward the
     total user count, and ``numRowsRemoved`` shows timeouts actually
     deleting state as the watermark advances.
  2. BATCHING INVARIANCE — the closed-session set from the 20-batch
     run (maxFilesPerTrigger=1) equals the single-batch run's set
     exactly (count + symmetric exceptAll), at this size.

Input shape: ``waves`` user cohorts, each active in its own one-hour
window (users have 2 events, 30 s apart); each wave is one parquet
file, so each wave is one micro-batch.  Every wave's watermark passes
the previous wave's end + gap, firing its event-time timeouts.

Usage:  python tools/sessionizer_scale_check.py [n_users] [waves]

Prints one JSON line; the committed evidence lives in SCALE.md.
Deterministic input (spark.range arithmetic, no randomness); temp
dirs are removed on exit.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    per_wave = n_users // waves

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qurio_spark.streaming.ingest import (
        sessionize_stream_evicting,
        streaming_state_partitions,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="qurio-sess-scale-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    t0 = 1_700_000_000

    def wave_df(w: int):
        # users [w*per_wave, (w+1)*per_wave), 2 events each: at
        # wave_start + uid%600 and +30s; value = exact cents
        u = spark.range(w * per_wave, (w + 1) * per_wave).select(
            F.col("id").alias("user_id")
        )
        e = u.select(
            "user_id",
            F.explode(F.array(F.lit(0), F.lit(30))).alias("off"),
        )
        return e.select(
            (F.col("user_id") * 2 + F.col("off") / 30).cast("long").alias(
                "event_id"
            ),
            (
                F.lit(t0 + w * 3600)
                + F.pmod(F.col("user_id"), F.lit(600))
                + F.col("off")
            ).cast("double").cast("timestamp").alias("ts"),
            "user_id",
            (F.pmod(F.col("user_id"), F.lit(1000)) / 100.0 + 0.01).alias(
                "value"
            ),
        )

    gen0 = time.monotonic()
    for w in range(waves):
        stage = os.path.join(base, f"stage{w}")
        wave_df(w).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dest = os.path.join(src, f"b{w:03d}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1000 + w, 1000 + w))  # deterministic batch order
        shutil.rmtree(stage)
    gen_s = time.monotonic() - gen0

    schema = "event_id long, ts timestamp, user_id long, value double"

    def run(out_name: str, one_file_per_batch: bool):
        reader = spark.readStream.schema(schema)
        if one_file_per_batch:
            reader = reader.option("maxFilesPerTrigger", 1)
        closed = sessionize_stream_evicting(
            reader.parquet(src), gap_s=1800, watermark="10 seconds"
        )
        out = os.path.join(base, out_name)
        t = time.monotonic()
        with streaming_state_partitions(spark, 32):
            q = (
                closed.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", out + "-ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        elapsed = time.monotonic() - t
        state = [
            {
                "batch": p["batchId"],
                "rows_total": p["stateOperators"][0]["numRowsTotal"],
                "rows_removed": p["stateOperators"][0]["numRowsRemoved"],
            }
            for p in (json.loads(x.json) for x in q.recentProgress)
            if p.get("stateOperators")
        ]
        return spark.read.parquet(out), elapsed, state

    many_df, many_s, state = run("many", True)
    one_df, one_s, _ = run("one", False)

    n_events = n_users * 2
    closed_many = many_df.count()
    closed_one = one_df.count()
    cols = ["user_id", "session_seq", "session_end_ms", "n_events",
            "session_value"]
    sym_diff = (
        many_df.select(cols).exceptAll(one_df.select(cols)).count()
        + one_df.select(cols).exceptAll(many_df.select(cols)).count()
    )
    # collision-free identity: (user_id, session_end_ms) never repeats
    dup_keys = (
        many_df.groupBy("user_id", "session_end_ms").count()
        .filter("count > 1").count()
    )
    peak_state = max(s["rows_total"] for s in state)
    final_state = [s for s in state if s["rows_total"] > 0][-1]["rows_total"]
    removed_total = sum(s["rows_removed"] for s in state)

    ok = (
        closed_many == closed_one
        and sym_diff == 0
        and dup_keys == 0
        # state bounded by the active cohort (2 waves can overlap the
        # gap window during a batch), NOT by the 1M cumulative users
        and peak_state <= 3 * per_wave
        and final_state <= 2 * per_wave
        and removed_total >= (waves - 2) * per_wave
        # all but the final wave's sessions closed
        and closed_many >= (waves - 1) * per_wave
    )
    print(json.dumps({
        "metric": "sessionizer_scale_check",
        "ok": ok,
        "n_users": n_users,
        "n_events": n_events,
        "waves": waves,
        "closed_sessions": closed_many,
        "closed_one_batch": closed_one,
        "sym_diff": sym_diff,
        "dup_session_keys": dup_keys,
        "peak_state_rows": peak_state,
        "final_state_rows": final_state,
        "state_rows_removed": removed_total,
        "gen_s": round(gen_s, 2),
        "many_batches_s": round(many_s, 2),
        "one_batch_s": round(one_s, 2),
        "events_per_s_many": int(n_events / many_s),
    }))
    shutil.rmtree(base, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
