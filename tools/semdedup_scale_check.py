#!/usr/bin/env python
"""Scale-validate SemDeDup one decade above the test SFs (the r11
operator landed with correctness pins but no decade-up evidence): the
100 TB claim is "every pairwise computation stays cluster-bounded
(sum-of-squares over clusters, hash-split cap 4096), never n^2" —
this check plants ground-truth semantic duplicates in a corpus an
order of magnitude beyond any fixture and measures:

  1. DEDUP CORRECTNESS — every id%10==1 vector is a tiny perturbation
     of id-1 (cosine ~0.9999 >> threshold): each planted pair must
     collapse to ONE survivor; unrelated random vectors (32-dim,
     pairwise |cos| << threshold) must ALL survive.
  2. PAIR-KERNEL WORK — sum over (cluster, hash-split block) of
     block_size^2, the actual gram-matrix element count, vs n^2.

Deterministic input (xxhash64-derived components, no RNG).

Usage:  python tools/semdedup_scale_check.py [n_vecs] [dim]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_block = 4096

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qurio_spark.operators.similarity import (
        _label_with,
        kmeans_fit,
        semantic_dedup,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    base_id = F.when(
        F.col("vec_id") % 10 == 1, F.col("vec_id") - 1
    ).otherwise(F.col("vec_id"))
    is_twin = F.col("vec_id") % 10 == 1

    def comp(j):
        # base component in [-1, 1]; twins add a ~1e-3 perturbation
        b = (
            F.pmod(F.xxhash64(base_id, F.lit(j)), F.lit(20001)) / 10000.0
            - 1.0
        )
        eps = (
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j), F.lit("e")),
                   F.lit(2001)) / 1_000_000.0
            - 0.001
        )
        return F.when(is_twin, b + eps).otherwise(b).cast("float")

    emb = ids.select(
        "vec_id",
        F.array(*[comp(j) for j in range(dim)]).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet("/tmp/semdedup_scale_emb")
    emb = spark.read.parquet("/tmp/semdedup_scale_emb")

    t0 = time.monotonic()
    survivors = semantic_dedup(
        emb, k=16, threshold=0.95, iters=3, max_block=max_block
    )
    surv_ids = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    dedup_s = time.monotonic() - t0

    planted = [(i - 1, i) for i in range(1, n, 10)]
    collapsed = sum(
        1 for a, b in planted if (a in surv_ids) != (b in surv_ids)
    )
    singles = n - 2 * len(planted)
    single_ids = {
        i for i in range(n) if i % 10 not in (0, 1)
    }
    singles_kept = len(surv_ids & single_ids)

    # pair-kernel work: sum over (cluster, hash-split block) of c^2
    cent = kmeans_fit(emb, k=16, iters=3)
    labeled, _ = _label_with(emb, cent, "vec_id", "embedding")
    sizes = [
        r["c"] for r in labeled.groupBy("label")
        .agg(F.count("*").alias("c")).collect()
    ]
    work = 0
    for c in sizes:
        n_splits = max(1, math.ceil(c / max_block))
        per = math.ceil(c / n_splits)
        work += n_splits * per * per
    # the actual bound the operator promises: each vector is compared
    # against at most min(|its cluster|, max_block) others — so total
    # work <= n * max(avg cluster size, max_block).  With k uniform
    # clusters that is ~n^2/k until clusters hit the cap, then n*4096
    # flat — LINEAR in n, never n^2.
    bound = 2 * n * max(max_block, math.ceil(n / 16))
    ok = (
        collapsed >= 0.995 * len(planted)   # pairs collapse to 1 survivor
        and singles_kept == singles          # no false merges
        and work <= min(bound, 0.2 * n * n)  # cluster-bounded, never n^2
    )
    print(json.dumps({
        "metric": "semdedup_scale_check",
        "ok": ok,
        "n_vecs": n,
        "dim": dim,
        "planted_pairs": len(planted),
        "pairs_collapsed": collapsed,
        "singletons": singles,
        "singletons_kept": singles_kept,
        "n_survivors": len(surv_ids),
        "pair_kernel_elems": int(work),
        "n_squared": n * n,
        "work_fraction": float(f"{work / (n * n):.3e}"),
        "cluster_sizes_max": max(sizes),
        "dedup_s": round(dedup_s, 2),
    }))
    import shutil

    shutil.rmtree("/tmp/semdedup_scale_emb", ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
