#!/usr/bin/env python
"""Scale-validate connected components one decade above the test
fixtures: CC is the rung every dedup family resolves groups through
(MinHash/SimHash/embedding near-dup, SemDeDup, canonical_docs), its
committed worst-case evidence is a 1,000-node chain — this check runs
the DISTRIBUTED alternating-star path (driver escape hatch disabled)
on two adversarial topologies at 200k nodes:

  1. ONE 200k-NODE CHAIN — the O(log n)-rounds worst case (a
     label-propagation algorithm needs diameter rounds = 200k; the
     star algorithm must converge in ~log2(n) alternations inside the
     default max_iters=25, or raise);
  2. 20k 10-CLIQUES — the realistic near-dup-group shape, checking
     min-id canonical labels for every component at volume.

Both also run through the driver union-find escape hatch (the default
for edge sets this small) and the two finishes must agree exactly.

Usage:  python tools/cc_scale_check.py [n_nodes]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qurio_spark.operators.dedup import connected_components

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nodes = spark.range(n).select(F.col("id").alias("doc_id"))

    # topology 1: one n-node chain
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.monotonic()
    lab = connected_components(chain, nodes, driver_max_edges=0)
    chain_ok = (
        lab.agg(
            F.count("*").alias("n"),
            F.countDistinct("cluster_id").alias("k"),
            F.max("cluster_id").alias("mx"),
        ).first()
    )
    chain_s = time.monotonic() - t0
    chain_good = (
        chain_ok["n"] == n and chain_ok["k"] == 1 and chain_ok["mx"] == 0
    )

    # driver union-find finish must agree (chain has n-1 < 500k edges)
    t1 = time.monotonic()
    lab2 = connected_components(chain, nodes)  # default escape hatch
    agree = (
        lab.join(lab2.withColumnRenamed("cluster_id", "c2"), "doc_id")
        .filter(F.col("cluster_id") != F.col("c2"))
        .count()
        == 0
    )
    driver_s = time.monotonic() - t1

    # topology 2: n/10 cliques of 10 (complete subgraphs)
    m = n // 10
    base = spark.range(m).select((F.col("id") * 10).alias("g"))
    pairs = base.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(8)),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.lit(9)),
                        lambda j: F.struct(
                            (F.col("g") + i).alias("id_a"),
                            (F.col("g") + j).alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    t2 = time.monotonic()
    clab = connected_components(pairs, nodes, driver_max_edges=0)
    bad_label = (
        clab.filter(
            F.col("cluster_id") != (F.col("doc_id") - F.pmod(F.col("doc_id"), 10))
        ).count()
    )
    k_comps = clab.select("cluster_id").distinct().count()
    clique_s = time.monotonic() - t2
    clique_good = bad_label == 0 and k_comps == m

    ok = bool(chain_good and agree and clique_good)
    print(json.dumps({
        "metric": "cc_scale_check",
        "ok": ok,
        "n_nodes": n,
        "chain_components": chain_ok["k"],
        "chain_label_max": chain_ok["mx"],
        "chain_distributed_s": round(chain_s, 2),
        "driver_finish_agrees": bool(agree),
        "driver_finish_s": round(driver_s, 2),
        "cliques": m,
        "clique_components": k_comps,
        "clique_bad_labels": bad_label,
        "clique_s": round(clique_s, 2),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
