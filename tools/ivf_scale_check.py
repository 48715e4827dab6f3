#!/usr/bin/env python
"""Scale-validate IVF search one decade above the test SFs (completes
the ANN evidence set: PQ's sqrt-law got its decade-up check in r10,
the dedup ladder in r12 — IVF's partition-pruned probe had recall
extras only at the bench SF): 200k vectors, 64-cluster codebook,
planted ground truth.

  1. PLANTED RECALL@1 — each query is a tiny perturbation of a known
     corpus vector (cosine ~0.9999, far above the ~0.6 max of random
     32-dim pairs); the nprobe-pruned scan must return that planted
     neighbor first, every time.  A miss means the probe picked the
     wrong clusters — the failure mode partition pruning risks.
  2. SCANNED FRACTION — probed cluster sizes / n: the cost claim.
  3. recall@10 vs the exact brute-force top-10 (reported; uniform
     random corpora scatter the post-planted neighbors across
     clusters, so this floor is soft by construction).

Deterministic input (xxhash64 components, no RNG).

Usage:  python tools/ivf_scale_check.py [n_vecs] [nprobe]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
K_CLUSTERS = 64
TOPK = 10
N_QUERIES = 20


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qurio_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_topk,
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

    def comp(j):
        return (
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(20001))
            / 10000.0
            - 1.0
        ).cast("float")

    emb = ids.select(
        "vec_id", F.array(*[comp(j) for j in range(DIM)]).alias("embedding")
    )
    emb.write.mode("overwrite").parquet("/tmp/ivf_scale_emb")
    emb = spark.read.parquet("/tmp/ivf_scale_emb")

    t0 = time.monotonic()
    labeled, centroids = ivf_build(emb, k=K_CLUSTERS, iters=3)
    labeled.write.mode("overwrite").partitionBy("label").parquet(
        "/tmp/ivf_scale_labeled"
    )
    labeled = spark.read.parquet("/tmp/ivf_scale_labeled")
    build_s = time.monotonic() - t0

    sizes = {
        r["label"]: r["c"]
        for r in labeled.groupBy("label").agg(F.count("*").alias("c")).collect()
    }

    # planted queries: perturb corpus vectors at spread-out ids
    bases = [i * (n // N_QUERIES) + 7 for i in range(N_QUERIES)]
    base_vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(bases)).collect()
    }
    hits1 = 0
    r10_sum = 0.0
    scanned = 0
    t_pruned = 0.0
    t_exact = 0.0
    for qi, b in enumerate(bases):
        qv = [
            v + (((qi * 1_000_003 + j * 7919) % 2001) / 1_000_000.0 - 0.001)
            for j, v in enumerate(base_vecs[b])
        ]
        t1 = time.monotonic()
        got = ivf_topk(
            labeled, qv, centroids=centroids, k=TOPK, nprobe=nprobe
        ).collect()
        t_pruned += time.monotonic() - t1
        # probe labels actually scanned (recompute the driver-side pick)
        from qurio_spark.operators.similarity import cosine, literal_vector

        ranked = (
            centroids.select(
                "label", cosine(F.col("centroid"), literal_vector(qv)).alias("s")
            )
            .orderBy(F.desc("s"))
            .limit(nprobe)
            .collect()
        )
        scanned += sum(sizes[r["label"]] for r in ranked)
        t2 = time.monotonic()
        exact = brute_force_topk(emb, qv, k=TOPK).collect()
        t_exact += time.monotonic() - t2
        hits1 += got and got[0]["vec_id"] == b
        r10_sum += len(
            {r["vec_id"] for r in got} & {r["vec_id"] for r in exact}
        ) / TOPK

    recall1 = hits1 / N_QUERIES
    recall10 = r10_sum / N_QUERIES
    frac = scanned / (n * N_QUERIES)
    ok = recall1 == 1.0 and frac <= 1.5 * nprobe / K_CLUSTERS
    print(json.dumps({
        "metric": "ivf_scale_check",
        "ok": bool(ok),
        "n_vecs": n,
        "k_clusters": K_CLUSTERS,
        "nprobe": nprobe,
        "queries": N_QUERIES,
        "recall_at_1_planted": recall1,
        "recall_at_10_vs_exact": round(recall10, 3),
        "scanned_fraction": round(frac, 4),
        "build_s": round(build_s, 2),
        "pruned_query_s_avg": round(t_pruned / N_QUERIES, 3),
        "exact_query_s_avg": round(t_exact / N_QUERIES, 3),
    }))
    import shutil

    shutil.rmtree("/tmp/ivf_scale_emb", ignore_errors=True)
    shutil.rmtree("/tmp/ivf_scale_labeled", ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
