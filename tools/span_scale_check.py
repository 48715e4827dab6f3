#!/usr/bin/env python
"""Scale-validate exact duplicate-substring removal (operators/dedup.
remove_duplicate_spans) two-plus decades above the oracle SF with
PLANTED ground truth, following tools/dedup_scale_check.py: the
100 TB claim is "one global gram-count shuffle + a semi-join — never
a cross join, never a suffix array on one node", and correctness is
"exactly the planted duplicated spans are removed, nothing else".

Corpus: n docs of 60 deterministic tokens drawn from a wide hash
space (xxhash64(doc, slot) — effectively collision-free at any n, so
NO k-gram repeats by chance).  Every doc with id % 10 == 1 carries a
PLANTED 12-token boilerplate block (shared corpus-wide, the licence-
header shape) spliced at slots 20..31; k=10 grams inside the block
repeat n/10 times, everything else is unique.  Expected outcome per
planted doc: exactly the 12 block slots drop (coverage of the three
in-block gram starts 20,21,22 is the union 20..31); clean docs pass
through untouched.

Usage:  python tools/span_scale_check.py [n_docs]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKENS = 60
BLOCK_AT = 20
BLOCK = 12
K = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pyspark.sql import functions as F

    from qurio_spark.operators.dedup import remove_duplicate_spans
    from qurio_spark.session import get_spark

    spark = get_spark(app_name="span-scale-check")

    t0 = time.time()
    # unique filler: t<hash(doc,slot)>; planted block: b<slot> shared
    # corpus-wide in docs with id % 10 == 1
    tok = F.when(
        (F.col("doc_id") % 10 == 1)
        & (F.col("slot") >= BLOCK_AT)
        & (F.col("slot") < BLOCK_AT + BLOCK),
        F.concat(F.lit("b"), F.col("slot").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("t"),
            F.abs(F.xxhash64("doc_id", "slot")).cast("string"),
        )
    )
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(0), F.lit(TOKENS - 1))).alias("slot"),
        )
        .select("doc_id", "slot", tok.alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("slot", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("text")
        )
        .persist()
    )
    n_docs = docs.count()
    gen_s = time.time() - t0

    t0 = time.time()
    out = remove_duplicate_spans(docs, k=K, min_count=2).persist()
    n_out = out.count()
    dedup_s = time.time() - t0

    planted = out.filter(F.col("doc_id") % 10 == 1)
    clean = out.filter(F.col("doc_id") % 10 != 1)
    # exact expectation: planted docs lose the 12 block slots, clean
    # docs lose nothing
    planted_ok = planted.filter(
        (F.col("n_removed") == BLOCK) & (F.col("n_kept") == TOKENS - BLOCK)
    ).count()
    clean_ok = clean.filter(
        (F.col("n_removed") == 0) & (F.col("n_kept") == TOKENS)
    ).count()
    n_planted = planted.count()
    n_clean = clean.count()

    print(
        json.dumps(
            {
                "metric": "span_scale_check",
                "ok": bool(
                    n_out == n_docs
                    and planted_ok == n_planted
                    and clean_ok == n_clean
                ),
                "n_docs": n_docs,
                "n_planted": n_planted,
                "planted_exact": planted_ok,
                "clean_untouched": clean_ok,
                "total_grams": n_docs * (TOKENS - K + 1),
                "gen_s": round(gen_s, 2),
                "dedup_s": round(dedup_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
