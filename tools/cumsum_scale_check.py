#!/usr/bin/env python
"""Scale-validate the distributed prefix sum (operators/prefix) on the
exact shape the r13 verdict flagged as the last scale-killer: 10M docs
in ONE source (the Common Crawl pretraining case), where the old
``Window.partitionBy(source)`` cumsum funnels every row through a
single reducer (VERDICT r13 #1).

Three proofs, printed as one JSON line:

  1. *Multi-task execution*: the bucketed path spreads the one source
     across >= buckets_min range buckets with no degenerate bucket
     (max bucket fraction reported).
  2. *Exactness at scale*: checksum (sum of crc32 over (doc_id,
     shard_id)) of pack_shards over the distributed path equals the
     single-window path's checksum at the full row count — the result
     is bit-identical, only the plan changed.
  3. *The speedup is real*: wall time of the bucketed cumsum vs the
     serialized single-window form on the same 10M-doc source.

Token counts are xxhash64-derived (1..500, deterministic, no text
materialization — the token_count override reads the count column).

Usage: python tools/cumsum_scale_check.py [n_docs]
Committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from qurio_spark.operators.prefix import distributed_cumsum
from qurio_spark.operators.sharding import pack_shards
from qurio_spark.session import get_spark


def _docs(spark, n_docs):
    return spark.range(n_docs).select(
        F.lit("commoncrawl").alias("source"),
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 9, "0")).alias(
            "doc_id"
        ),
        (F.pmod(F.xxhash64("id"), F.lit(500)) + 1).alias("n"),
    )


def _checksum(df):
    return df.agg(
        F.sum(
            F.crc32(
                F.concat_ws(":", "doc_id", F.col("shard_id").cast("string"))
            )
        ).alias("c"),
        F.count("*").alias("n"),
    ).first()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    budget = 100_000
    spark = get_spark(app_name="cumsum-scale-check")
    docs = _docs(spark, n_docs)

    # 1. bucket spread of the raw primitive
    t0 = time.time()
    spread = (
        distributed_cumsum(
            docs.select("source", "doc_id", F.col("n").alias("v")),
            "v", "source", "doc_id", "cum", keep_bucket="b",
        )
        .groupBy("b")
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    dist_s = time.time() - t0
    n_buckets = len(spread)
    max_frac = max(r["rows"] for r in spread) / n_docs

    # 2. + 3. pack_shards end-to-end: distributed vs single-window
    t0 = time.time()
    got = _checksum(
        pack_shards(
            docs, budget, text_col="n", token_count=lambda c: c,
            persist_counts=False,  # the override is a trivial column
        )
    )
    packed_s = time.time() - t0

    t0 = time.time()
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    serial = (
        docs.withColumn("_cum", F.sum("n").over(w))
        .select(
            "source",
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.floor((F.col("_cum") - F.col("n")) / F.lit(budget))
            .cast("long")
            .alias("shard_id"),
        )
    )
    want = _checksum(serial)
    serial_s = time.time() - t0

    print(json.dumps({
        "metric": "cumsum_scale_check",
        "ok": (got["c"], got["n"]) == (want["c"], want["n"])
        and n_buckets >= 8
        and max_frac < 0.5,
        "n_docs": n_docs,
        "one_source": True,
        "buckets_used": n_buckets,
        "max_bucket_frac": round(max_frac, 4),
        "checksum_match": (got["c"], got["n"]) == (want["c"], want["n"]),
        "distributed_cumsum_s": round(dist_s, 2),
        "pack_shards_distributed_s": round(packed_s, 2),
        "pack_shards_single_window_s": round(serial_s, 2),
    }))


if __name__ == "__main__":
    main()
