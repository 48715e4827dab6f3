#!/usr/bin/env python
"""Scale-validate the de-windowed shapes on single-group worst cases —
the shapes where a per-group window COULD funnel everything through
one reducer:

  1. `distributed_rank` (the lm_buckets exact-ntile engine): n docs in
     ONE source, composite (double, id) order key — checksum of ranks
     vs the window row_number form, wall times for both.  FULL ranking
     has no top-n filter, so Spark's WindowGroupLimit cannot help and
     the distributed prefix-sum rank is genuinely required.
  2. `stratified_sample_exact`: n rows in ONE stratum — result equals
     the naive global orderBy/limit ground truth, wall time, and the
     plan must carry the map-side WindowGroupLimit(Partial).
  3. `canonical_pick`: ONE cluster with n members — argmax equals the
     direct max over the members, wall time.
  4. `grouped_top_n` vs the r14/r15 HAND-ROLLED two-phase top-n on one
     hot group: identical sets, both wall times, and the native plan's
     WindowGroupLimit(Partial) assert.  This is the measurement that
     RETIRED the hand-rolled form (operators/topn module doc): Spark's
     InferWindowGroupLimit already pre-filters map-side, so rank-filter
     top-n never ships a hot group to one reducer, and the extra
     exchange + md5 sub-bucket hash of the hand-rolled form is pure
     overhead.

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

    # -- 2. stratified exact-n, one stratum ----------------------------
    from qurio_spark.functions.hashing import hash64
    from qurio_spark.operators.topn import has_partial_group_limit

    # dominant-stratum shape: ids < 10 are singleton strata, everything
    # else one hot stratum.  NOT a literal-constant stratum column —
    # Catalyst eliminates a constant partition key and plans a global
    # sort-limit instead, which would dodge the WindowGroupLimit path
    # this check pins.
    strat_col = F.when(
        F.col("k") < 10, F.col("k").cast("string")
    ).otherwise(F.lit("hot"))
    sdf = df.withColumn("s2", strat_col)
    strat_df = stratified_sample_exact(sdf, 1000, strata_col="s2", id_col="k")
    t0 = time.time()
    got_set = {r["k"] for r in strat_df.select("k").collect()}
    strat_s = time.time() - t0
    h = hash64(F.concat(F.lit("strat:"), F.col("k").cast("string")))
    want_hot = {
        r["k"]
        for r in sdf.filter(F.col("s2") == "hot")
        .select("k", h.alias("_h"))
        .orderBy(F.asc("_h"), F.asc("k"))
        .limit(1000)
        .collect()
    }
    want_set = want_hot | set(range(10))
    out["stratified_sets_equal"] = (
        got_set == want_set and len(got_set) == 1010
    )
    out["stratified_s"] = round(strat_s, 2)
    out["stratified_partial_group_limit"] = has_partial_group_limit(strat_df)

    # -- 3. canonical pick, one mega-cluster (+ singleton clusters so
    #       the cluster key is not a foldable constant) ----------------
    clusters = spark.range(n).select(
        F.col("id").alias("id"),
        F.when(F.col("id") < 10, F.col("id")).otherwise(F.lit(10)).alias(
            "cluster_id"
        ),
    )
    ranks = spark.range(n).select(
        F.col("id").alias("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e6).alias("pr"),
    )
    t0 = time.time()
    picks = {
        r["cluster_id"]: r for r in canonical_pick(clusters, ranks).collect()
    }
    pick_s = time.time() - t0
    best = (
        ranks.filter(F.col("id") >= 10)
        .orderBy(F.desc("pr"), F.asc("id"))
        .limit(1)
        .first()
    )
    out["canonical_correct"] = (
        len(picks) == 11
        and picks[10]["canonical_id"] == best["id"]
        and picks[10]["n_members"] == n - 10
        and all(picks[i]["canonical_id"] == i for i in range(10))
    )
    out["canonical_s"] = round(pick_s, 2)

    # -- 4. grouped_top_n (native WindowGroupLimit) vs the hand-rolled
    #       two-phase form, one dominant group holding ~every row ------
    from qurio_spark.operators.topn import grouped_top_n

    cand = spark.range(n).select(
        F.when(F.col("id") < 10, F.col("id").cast("string"))
        .otherwise(F.lit("q1"))
        .alias("qid"),
        F.col("id").alias("doc"),
        (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)) / 1e6).alias(
            "score"
        ),
    )
    order = [F.desc("score"), F.asc("doc")]
    native = grouped_top_n(cand, ["qid"], order, 100)
    t0 = time.time()
    native_k = {r["doc"] for r in native.select("doc").collect()}
    native_s = time.time() - t0
    out["topn_partial_group_limit"] = has_partial_group_limit(native)

    # the retired r14/r15 hand-rolled two-phase, inlined for the
    # comparison: md5 sub-bucket -> per-bucket top-n -> survivor top-n
    t0 = time.time()
    sb = F.pmod(hash64(F.col("doc").cast("string")), F.lit(32))
    w1 = Window.partitionBy("qid", "_sb").orderBy(*order)
    pruned = (
        cand.withColumn("_sb", sb)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= 100)
        .drop("_rk1", "_sb")
    )
    wq = Window.partitionBy("qid").orderBy(*order)
    handrolled_k = {
        r["doc"]
        for r in pruned.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= 100)
        .select("doc")
        .collect()
    }
    handrolled_s = time.time() - t0
    # 100 from the hot group + the 10 singleton-group rows
    out["topn_sets_equal"] = native_k == handrolled_k and len(native_k) == 110
    out["topn_native_s"] = round(native_s, 2)
    out["topn_handrolled_two_phase_s"] = round(handrolled_s, 2)

    out["ok"] = bool(
        out["rank_checksum_match"]
        and out["stratified_sets_equal"]
        and out["stratified_partial_group_limit"]
        and out["canonical_correct"]
        and out["topn_sets_equal"]
        and out["topn_partial_group_limit"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
