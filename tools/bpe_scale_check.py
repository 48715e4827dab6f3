#!/usr/bin/env python
"""Time BPE training at a REAL vocabulary scale (VERDICT r13 #5).

The r13 trainer recounted every pair from scratch per merge —
O(n_merges x dictionary symbols), hours at a 32k vocab.  The r14
trainer patches pair counts incrementally (only words containing the
merged pair change), making the driver-side merge loop linear in
total rewrites.  This check trains n_merges=8000 over a 50k-word
dictionary drawn from sf0.1 documents plus synthetic morphology
(suffix-sharing words, so merges keep finding repeating pairs deep
into the run) and reports the wall time, plus an equality probe of
the first 200 merges against a from-scratch recount reference.

Usage: python tools/bpe_scale_check.py [n_merges]
Committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from qurio_spark.functions.bpe import EOW, _merge_word, train_bpe
from qurio_spark.session import get_spark


def _reference_merges(wc, n_merges):
    """The r13 recount-from-scratch loop, kept here as the equality
    oracle for the incremental trainer."""
    words = {w: (tuple(list(w) + [EOW]), c) for w, c in wc}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best_count = max(counts.values())
        if best_count < 2:
            break
        best = min(p for p, c in counts.items() if c == best_count)
        merges.append(best)
        words = {
            w: (_merge_word(s, best), c) for w, (s, c) in words.items()
        }
    return merges


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    spark = get_spark(app_name="bpe-scale-check")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # widen the dictionary with deterministic morphology so deep merges
    # still find repeating pairs (real corpora have this shape; the
    # sf0.1 vocabulary alone saturates after a few thousand merges)
    synth = spark.range(200_000).select(
        F.concat(
            F.lit("stem"),
            F.pmod(F.xxhash64("id"), F.lit(3000)).cast("string"),
            F.element_at(
                F.array(*[F.lit(s) for s in
                          ("ing", "ed", "ness", "ation", "izing", "ology")]),
                (F.pmod(F.xxhash64(F.col("id") + 3), F.lit(6)) + 1).cast("int"),
            ),
        ).alias("text")
    )
    corpus = docs.select("text").unionByName(synth)

    t0 = time.time()
    merges = train_bpe(corpus, n_merges=n_merges, max_words=50_000)
    train_s = time.time() - t0

    # equality probe vs the from-scratch reference on the same
    # dictionary, first 200 merges (the reference is too slow for 8k)
    from qurio_spark.functions.bpe import _word_counts

    wc = _word_counts(corpus, "text", 50_000)
    ref = _reference_merges(wc, 200)
    match = merges[:200] == ref

    print(json.dumps({
        "metric": "bpe_scale_check",
        "ok": match and len(merges) >= min(n_merges, 4000),
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "dictionary_words": len(wc),
        "first200_match_reference": match,
        "train_s": round(train_s, 2),
    }))


if __name__ == "__main__":
    main()
