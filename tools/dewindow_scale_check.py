#!/usr/bin/env python
"""Scale-validate the r14 de-windowing on single-group worst cases —
the shapes where the replaced per-group windows funneled everything
through one reducer:

  1. `distributed_rank` (the lm_buckets exact-ntile engine): n docs in
     ONE source, composite (double, id) order key — checksum of ranks
     vs the window row_number form, wall times for both.
  2. `stratified_sample_exact`: n rows in ONE stratum, two-phase
     (default) vs single-phase (n_prebuckets=1) — identical result
     sets, wall times.
  3. `canonical_pick`: ONE cluster with n members — two-phase argmax
     result equals the direct min/max over the members, wall time.

Usage: python tools/dewindow_scale_check.py [n_rows]
Committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qurio_spark.operators.graph import canonical_pick
from qurio_spark.operators.prefix import distributed_rank
from qurio_spark.operators.sharding import stratified_sample_exact
from qurio_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(app_name="dewindow-scale-check")
    out = {"metric": "dewindow_scale_check", "n_rows": n, "one_group": True}

    # -- 1. distributed_rank, composite key, one part ------------------
    df = spark.range(n).select(
        F.lit("cc").alias("s"),
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1000.0).alias("r"),
    )
    t0 = time.time()
    got = (
        distributed_rank(df, "s", ["r", "k"], "rk", hash_col="k")
        .agg(F.sum(F.crc32(F.concat_ws(":", "k", "rk"))).alias("c"))
        .first()["c"]
    )
    rank_dist_s = time.time() - t0
    t0 = time.time()
    w = Window.partitionBy("s").orderBy(F.asc("r"), F.asc("k"))
    want = (
        df.withColumn("rk", F.row_number().over(w))
        .agg(F.sum(F.crc32(F.concat_ws(":", "k", "rk"))).alias("c"))
        .first()["c"]
    )
    rank_win_s = time.time() - t0
    out["rank_checksum_match"] = got == want
    out["rank_distributed_s"] = round(rank_dist_s, 2)
    out["rank_single_window_s"] = round(rank_win_s, 2)

    # -- 2. stratified two-phase top-n, one stratum --------------------
    t0 = time.time()
    two = {
        r["k"]
        for r in stratified_sample_exact(
            df, 1000, strata_col="s", id_col="k"
        ).select("k").collect()
    }
    strat2_s = time.time() - t0
    t0 = time.time()
    one = {
        r["k"]
        for r in stratified_sample_exact(
            df, 1000, strata_col="s", id_col="k", n_prebuckets=1
        ).select("k").collect()
    }
    strat1_s = time.time() - t0
    out["stratified_sets_equal"] = two == one and len(two) == 1000
    out["stratified_two_phase_s"] = round(strat2_s, 2)
    out["stratified_single_window_s"] = round(strat1_s, 2)

    # -- 3. canonical pick, one mega-cluster ---------------------------
    clusters = spark.range(n).select(
        F.col("id").alias("id"), F.lit(0).alias("cluster_id")
    )
    ranks = spark.range(n).select(
        F.col("id").alias("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e6).alias("pr"),
    )
    t0 = time.time()
    pick = canonical_pick(clusters, ranks).first()
    pick_s = time.time() - t0
    best = (
        ranks.orderBy(F.desc("pr"), F.asc("id")).limit(1).first()
    )
    out["canonical_correct"] = (
        pick["canonical_id"] == best["id"]
        and pick["n_members"] == n
    )
    out["canonical_two_phase_s"] = round(pick_s, 2)

    out["ok"] = bool(
        out["rank_checksum_match"]
        and out["stratified_sets_equal"]
        and out["canonical_correct"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
