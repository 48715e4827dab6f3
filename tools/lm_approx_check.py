#!/usr/bin/env python
"""Scale-validate lm_buckets(exact=False) — the 100-TB CCNet selection
path (VERDICT r14 residual gap: the approx path had only unit-level
evidence).  Claims checked one-plus decades above the oracle SF:

  1. planted agreement: on a well-separated corpus the approx buckets
     EQUAL the exact ntile buckets for every doc (not just "monotone
     along the ratio order");
  2. the bucketing step never shuffles the corpus: past the persisted
     scoring subtree the executed plan carries exactly ONE live
     exchange — the per-source percentile_approx sketch aggregation
     (partial-agged sketches, not rows) — and the cutoffs attach by
     broadcast;
  3. the approx path is not slower than exact at scale (it drops the
     distributed-rank machinery: no corpus exchange on (source,
     bucket), no totals/offsets joins).

Planted ground truth: three CONSTANT-ratio tiers (tier = doc_id % 3,
every doc in a tier carries identical text, so identical
cost_millinats/n_bigrams).  Tier 0 is the training chain (cheapest);
tiers 1/2 are half-chain/half-noise and all-OOV noise — the add-v
smoothing makes all-OOV CHEAPER per bigram than mixed text, so bucket
order is checked against the MEASURED ratio order, not the tier
index.  Four sources with per-source tier counts exactly equal and
divisible by n_buckets, so exact ntile puts each tier wholly in one
bucket regardless of the id tie-break; percentile_approx (a GK
sketch — returns an ELEMENT, never interpolates) must return the two
lower tier constants as the 1/3 and 2/3 cutoffs, making approx
buckets identical.  Any disagreement is a real bucketing bug, not
sketch noise.

Usage:  python tools/lm_approx_check.py [n_docs]   (default 1,200,000)

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from qurio_spark.operators.cachectl import release_caches
from qurio_spark.operators.lm import lm_buckets
from qurio_spark.session import get_spark


def _live_shuffles(df):
    from tools.plan_audit import count_exchanges, live_lines

    live = live_lines(df)
    n = count_exchanges(live)
    # before the action runs the AQE plan prints the join node but not
    # yet a BroadcastExchange stage — accept either spelling
    bcast = any(
        "BroadcastExchange" in l or "BroadcastHashJoin" in l for l in live
    )
    return n, bcast


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_docs -= n_docs % 12  # 4 sources x 3 tiers, equal cells
    spark = get_spark(app_name="lm-approx-check")
    spark.sparkContext.setLogLevel("ERROR")

    chain = " ".join(f"d{j % 10}" for j in range(50))
    mixed = " ".join(
        f"d{j % 10}" if j % 2 == 0 else f"n{j}" for j in range(50)
    )
    noise = " ".join(f"n{j}" for j in range(50))
    texts = F.array(F.lit(chain), F.lit(mixed), F.lit(noise))

    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), ((F.col("id") / 3) % 4).cast("int")).alias(
                "source"
            ),
            F.element_at(texts, (F.col("id") % 3).cast("int") + 1).alias(
                "text"
            ),
        )
    )
    train = spark.createDataFrame([(0, chain)], "doc_id long, text string")

    t0 = time.time()
    exact = lm_buckets(docs, train, n_buckets=3).persist()
    exact.count()
    t_exact = time.time() - t0

    t0 = time.time()
    approx = lm_buckets(docs, train, n_buckets=3, exact=False)
    approx.count()
    t_approx = time.time() - t0
    live_ex, has_bcast = _live_shuffles(approx)

    cmp = (
        exact.select("doc_id", F.col("bucket").alias("b_exact"))
        .join(
            approx.select("doc_id", F.col("bucket").alias("b_approx")),
            ["doc_id"],
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("b_exact") != F.col("b_approx")).cast("long")
            ).alias("mismatches"),
        )
        .collect()[0]
    )
    # planted truth: every constant-ratio tier lands WHOLLY in one
    # bucket and buckets follow the ratio order (the add-v smoothing
    # makes all-OOV noise cheaper per bigram than mixed text, so the
    # tier->bucket order is data-defined, not tier index order)
    tiers = (
        exact.withColumn("tier", F.col("doc_id") % 3)
        .groupBy("tier")
        .agg(
            F.countDistinct("bucket").alias("nb"),
            F.min("bucket").alias("bucket"),
            F.min(
                F.col("cost_millinats") / F.col("n_bigrams")
            ).alias("ratio"),
        )
        .collect()
    )
    by_ratio = sorted(tiers, key=lambda r: r["ratio"])
    planted_ok = all(r["nb"] == 1 for r in tiers) and [
        r["bucket"] for r in by_ratio
    ] == [1, 2, 3]
    release_caches(approx)
    exact.unpersist()
    release_caches(exact)

    out = {
        "check": "lm_approx",
        "n_docs": n_docs,
        "compared": cmp["n"],
        "mismatches": cmp["mismatches"],
        "planted_ok": planted_ok,
        "approx_live_shuffles": live_ex,
        "cutoffs_broadcast": has_bcast,
        "t_exact_s": round(t_exact, 1),
        "t_approx_s": round(t_approx, 1),
        "ok": (
            cmp["n"] == n_docs
            and cmp["mismatches"] == 0
            and planted_ok
            and live_ex <= 1
            and has_bcast
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
