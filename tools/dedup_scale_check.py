#!/usr/bin/env python
"""Scale-validate the MinHash-LSH near-dup ladder one decade above the
test SFs (the discipline of tools/pq_scale_check.py applied to the
dedup family): the 100 TB claim is "banded, never all-pairs" — this
check PLANTS known near-duplicate pairs in a synthetic corpus an order
of magnitude larger than any test fixture and measures the two numbers
the claim rests on:

  1. RECALL on the planted pairs — banding must still FIND the dups
     (a pruning strategy that drops true pairs is just wrong, not
     fast);
  2. CANDIDATE VOLUME — the number of pairs the band join would
     compare (sum over (band, key) buckets of C(g,2)), which must be
     a vanishing fraction of the all-pairs n*(n-1)/2.

Corpus: deterministic word-salad (40 words from a 2000-word vocab via
xxhash64(id, position) — no RNG), with every id % 10 == 1 doc a
MUTATED COPY of id-1 (2 of 40 word slots re-hashed): char-3-gram
Jaccard ~0.9, the classic near-dup shape.  n/10 planted pairs.

Usage:  python tools/dedup_scale_check.py [n_docs]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 2000
WORDS = 40
MUT = 2  # mutated word slots in each planted twin


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from qurio_spark.operators.dedup import (
        _lsh_banded,
        minhash_lsh_pairs,
        minhash_signatures,
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

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    base_id = F.when(
        F.col("doc_id") % 10 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    is_twin = (F.col("doc_id") % 10 == 1).cast("int")

    def word(i):
        # twin docs re-hash slots < MUT under their OWN id
        src = F.when(
            (F.lit(i) < MUT) & (is_twin == 1), F.col("doc_id")
        ).otherwise(base_id)
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, F.lit(i)), F.lit(VOCAB)).cast("string"),
        )

    docs = ids.select(
        "doc_id",
        F.concat_ws(" ", *[word(i) for i in range(WORDS)]).alias("text"),
    )

    t0 = time.monotonic()
    sig = minhash_signatures(docs, num_perm=16, n=3)
    sig.write.mode("overwrite").parquet("/tmp/dedup_scale_sig")
    sig = spark.read.parquet("/tmp/dedup_scale_sig")
    sig_s = time.monotonic() - t0

    # candidate volume: what the band equality-join would compare
    banded = _lsh_banded(sig, 16, 4, "doc_id")
    cand = (
        banded.groupBy("band", "key")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0]
    )
    all_pairs = n * (n - 1) / 2

    t1 = time.monotonic()
    pairs = minhash_lsh_pairs(
        docs, num_perm=16, bands=4, threshold=0.5, signatures=sig
    )
    found = pairs.select("id_a", "id_b").collect()
    pairs_s = time.monotonic() - t1

    planted = {(i - 1, i) for i in range(1, n, 10)}
    got = {(r["id_a"], r["id_b"]) for r in found}
    recall = len(planted & got) / len(planted)
    # non-planted survivors must themselves be high-estimate pairs
    # (vocab collisions can produce real near-dups; count them honestly)
    extras = len(got - planted)

    ok = (
        recall >= 0.9
        and cand <= 20 * n          # linear-ish, never quadratic
        and cand / all_pairs < 1e-3  # vanishing fraction of all-pairs
    )
    print(json.dumps({
        "metric": "dedup_scale_check",
        "ok": ok,
        "n_docs": n,
        "planted_pairs": len(planted),
        "recall_planted": round(recall, 4),
        "candidate_pairs": int(cand),
        "all_pairs": int(all_pairs),
        "candidate_fraction": float(f"{cand / all_pairs:.3e}"),
        "found_pairs": len(got),
        "extra_pairs": extras,
        "signature_build_s": round(sig_s, 2),
        "pair_scan_s": round(pairs_s, 2),
    }))
    import shutil

    shutil.rmtree("/tmp/dedup_scale_sig", ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
