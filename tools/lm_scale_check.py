#!/usr/bin/env python
"""Scale-validate the curation-scoring pair (operators/lm,
operators/dsir) one-plus decades above the oracle SF (the
tools/*_scale_check.py discipline): the 100 TB claims are

  lm_quality:   "the LM tables are bounded by the vocab cap, every
                 join broadcasts, the corpus never shuffles on token
                 keys" — and the scores actually SEPARATE in-domain
                 text from noise;
  dsir_weights: "the bucket tables are <= n_buckets rows regardless
                 of corpus size" — and target-domain docs outscore
                 non-target docs.

Corpus: deterministic (xxhash64-derived, no RNG) synthetic docs, 50
tokens each.  Even doc_ids are IN-DOMAIN: a successor-chain walk over
a 100-word vocabulary ("d<(start + j) % 100>", start hashed per doc)
— real bigram STRUCTURE (every context has one successor), which is
what a bigram LM actually learns; uniformly-random tokens would have
a uniform true bigram distribution that no LM can separate from
noise.  Odd doc_ids draw uniformly from a 5,000-word noise
vocabulary ("n<i>").  The LM trains on doc_id % 4 == 0 (half the
in-domain docs); DSIR's target is the same subset.  Planted ground
truth: every in-domain doc must score better than every noise doc on
BOTH scores (the chain pairs are all heavily attested in train while
noise is all-OOV, so the separation is total — anything less is a
bug).

Usage:  python tools/lm_scale_check.py [n_docs]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from qurio_spark.operators.dsir import dsir_weights
from qurio_spark.operators.lm import lm_cross_entropy, train_bigram_lm
from qurio_spark.session import get_spark


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="lm-scale-check")
    t0 = time.time()

    # build via a lambda-free route: sequence + posexplode, then
    # re-assemble — keeps the token expr in pure SQL
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    toks = base.select(
        "doc_id", F.posexplode(F.sequence(F.lit(1), F.lit(50))).alias("j", "_")
    ).selectExpr(
        "doc_id",
        "j",
        "CASE WHEN doc_id % 2 = 0 "
        "THEN concat('d', CAST(pmod(pmod(xxhash64(doc_id), 100) + j, 100) AS INT)) "
        "ELSE concat('n', CAST(pmod(xxhash64(doc_id, j), 5000) AS INT)) END AS w",
    )
    docs = (
        toks.groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("j", "w"))).getField("w"), " ").alias("text"))
    )
    docs = docs.persist()
    n = docs.count()
    gen_s = time.time() - t0

    train = docs.filter(F.col("doc_id") % 4 == 0)

    # --- LM ---
    t1 = time.time()
    vocab, uni, bi, v_size = train_bigram_lm(train, max_vocab=512)
    lm_sizes = {"vocab": vocab.count(), "uni": uni.count(), "bi": bi.count()}
    lm = lm_cross_entropy(docs, train, max_vocab=512)
    rows = lm.filter(F.col("n_bigrams") > 0).select(
        "doc_id",
        (F.col("cost_millinats") / F.col("n_bigrams")).alias("per_bigram"),
    )
    sep = rows.select(
        F.max(F.when(F.col("doc_id") % 2 == 0, F.col("per_bigram"))).alias("max_in"),
        F.min(F.when(F.col("doc_id") % 2 == 1, F.col("per_bigram"))).alias("min_out"),
    ).first()
    lm_s = time.time() - t1

    # --- DSIR ---
    t2 = time.time()
    d = dsir_weights(docs, train, n_buckets=4096)
    drows = d.filter(F.col("n_tokens") > 0).select(
        "doc_id", (F.col("logw_millinats") / F.col("n_tokens")).alias("per_tok")
    )
    dsep = drows.select(
        F.min(F.when(F.col("doc_id") % 2 == 0, F.col("per_tok"))).alias("min_in"),
        F.max(F.when(F.col("doc_id") % 2 == 1, F.col("per_tok"))).alias("max_out"),
    ).first()
    dsir_s = time.time() - t2

    ok = bool(
        sep["max_in"] < sep["min_out"] and dsep["min_in"] > dsep["max_out"]
        and lm_sizes["vocab"] <= 512
    )
    print(json.dumps({
        "metric": "lm_scale_check",
        "ok": ok,
        "n_docs": n,
        "n_tokens": n * 50,
        "lm_vocab": lm_sizes["vocab"],
        "lm_uni_rows": lm_sizes["uni"],
        "lm_bi_rows": lm_sizes["bi"],
        "lm_max_in_cost": round(float(sep["max_in"]), 1),
        "lm_min_out_cost": round(float(sep["min_out"]), 1),
        "dsir_min_in_logw": round(float(dsep["min_in"]), 1),
        "dsir_max_out_logw": round(float(dsep["max_out"]), 1),
        "gen_s": round(gen_s, 2),
        "lm_s": round(lm_s, 2),
        "dsir_s": round(dsir_s, 2),
    }))
    docs.unpersist()


if __name__ == "__main__":
    main()
