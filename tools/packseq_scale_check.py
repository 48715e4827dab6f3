#!/usr/bin/env python
"""Scale-validate pack_sequences (operators/sharding) three decades
above the oracle SF: the 100 TB claim is "ONE cumsum window shuffle
per source + a bounded explode", and the packing invariants are exact
by construction.  1M synthetic docs across 20 sources with
deterministic per-doc token counts (xxhash64-derived, 1..500, no RNG
and no text materialization — the token_count override reads the
count column directly); planted ground truth per source:

  1. every sequence except the last holds EXACTLY seq_len tokens;
  2. token conservation: sum over sequences == sum over docs;
  3. sequence count == ceil(source_tokens / seq_len).

Usage: python tools/packseq_scale_check.py [n_docs]
Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from qurio_spark.operators.sharding import pack_sequences
from qurio_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    seq_len = 2048
    spark = get_spark(app_name="packseq-scale-check")
    t0 = time.time()
    docs = spark.range(n_docs).select(
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(500)) + 1).alias("n"),
    )
    out = pack_sequences(
        docs, seq_len, text_col="n", token_count=lambda c: c,
        persist_counts=False,  # the override is a trivial column
    ).persist()
    per_src = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.max("seq_id").alias("max_seq"),
            F.sum(F.when(F.col("n_tokens") == seq_len, 1).otherwise(0)).alias("n_full"),
        )
    )
    truth = docs.groupBy("source").agg(F.sum("n").alias("doc_tokens"))
    joined = per_src.join(truth, "source").withColumn(
        "want_seqs", F.ceil(F.col("doc_tokens") / seq_len)
    )
    bad = joined.filter(
        (F.col("seq_tokens") != F.col("doc_tokens"))
        | (F.col("n_seqs") != F.col("want_seqs"))
        | (F.col("max_seq") != F.col("n_seqs") - 1)
        | (F.col("n_full") < F.col("n_seqs") - 1)
    ).count()
    tot = out.agg(F.sum("n_tokens"), F.count("*")).first()
    run_s = time.time() - t0
    print(json.dumps({
        "metric": "packseq_scale_check",
        "ok": bad == 0,
        "n_docs": n_docs,
        "seq_len": seq_len,
        "n_sequences": tot[1],
        "total_tokens": tot[0],
        "violating_sources": bad,
        "run_s": round(run_s, 2),
    }))
    out.unpersist()


if __name__ == "__main__":
    main()
