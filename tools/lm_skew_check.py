#!/usr/bin/env python
"""Hot-bigram skew check for lm_cross_entropy (VERDICT r13 #2).

The 100-TB caveat: ``bi`` (train bigram counts) is bounded by distinct
mapped pairs — NOT guaranteed broadcastable — and when it exceeds the
broadcast threshold the scoring join falls back to a shuffle on
(w1m, w2m), where hot pairs ("of the") are exactly the skew the module
doc promises to avoid.  The r14 fix pre-aggregates each doc's bigrams
to (doc, w1m, w2m, cnt) before the join, capping a hot pair's exchange
rows at ONE PER DOCUMENT.

This check plants the worst case: every one of n_docs documents
contains the same hot bigram multiple times (Zipf tail supplies the
diverse pairs), then scores the corpus twice —

  1. default session (bi broadcasts at this size), and
  2. ``spark.sql.autoBroadcastJoinThreshold=-1`` (every non-hinted
     join forced to shuffle — the degraded 100-TB path),

and asserts the two integer aggregates (sum cost, sum n_bigrams) are
IDENTICAL and reports both wall times plus the forced plan's join mix.

Usage: python tools/lm_skew_check.py [n_docs]
Committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from qurio_spark.operators.lm import lm_cross_entropy
from qurio_spark.session import get_spark


def _corpus(spark, n_docs):
    """Every doc: 3x the hot pair + a Zipf-ish rare tail pair."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("of the of the of the rare"),
            F.pmod(F.xxhash64("id"), F.lit(50000)).cast("string"),
            F.lit(" tail"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(50000)).cast("string"),
        ).alias("text"),
    )


def _agg(df):
    r = df.agg(
        F.sum("cost_millinats").alias("c"), F.sum("n_bigrams").alias("n")
    ).first()
    return (r["c"], r["n"])


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="lm-skew-check")
    docs = _corpus(spark, n_docs)
    train = docs.filter(F.col("doc_id") % 10 == 0)

    t0 = time.time()
    want = _agg(lm_cross_entropy(docs, train, max_vocab=65536))
    bcast_s = time.time() - t0

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        scored = lm_cross_entropy(docs, train, max_vocab=65536)
        t0 = time.time()
        got = _agg(scored)
        forced_s = time.time() - t0
        plan = scored._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    print(json.dumps({
        "metric": "lm_skew_check",
        "ok": got == want,
        "n_docs": n_docs,
        "hot_pair_occurrences": 3 * n_docs,
        "aggregates_match": got == want,
        "cost_sum": got[0],
        "bigrams_sum": got[1],
        "broadcast_path_s": round(bcast_s, 2),
        "forced_shuffle_path_s": round(forced_s, 2),
        "forced_plan_smj": len(re.findall(r"SortMergeJoin", plan)),
        "forced_plan_shj": len(re.findall(r"ShuffledHashJoin", plan)),
    }))


if __name__ == "__main__":
    main()
