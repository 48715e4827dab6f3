#!/usr/bin/env python
"""Scale-validate the SymSpell symmetric-delete fuzzy join one-plus
decades above the oracle SF (the tools/dedup_scale_check.py
discipline applied to operators/fuzzy.py): the 100 TB claim is
"O(len) neighborhood keys + an equality join — never a cross join",
and the blocking is LOSSLESS for edit distance 1.  This check builds
a deterministic vocabulary far larger than any test fixture, plants a
known corruption per 7th string, and measures the numbers the claim
rests on:

  1. PLANTED RECALL — every corrupted string must recover its source
     (must be exactly 1.0: the blocking is lossless, so anything less
     is a bug, not a tuning knob);
  2. CANDIDATE VOLUME — distinct candidate pairs entering the
     levenshtein verify vs the brute-force n_dirty * n_clean the
     oracle pays (the blocking factor);
  3. wall time for build + join at this scale.

Vocabulary: "w<base36(xxhash64(i))>" strings (length ~14, no RNG —
deterministic across runs), n distinct clean strings; every 7th
generates a dirty twin with ONE character deleted at position
xxhash64(i, 1) % len.  Planted truth: (dirty_i, clean_i) must appear
in the output with dist == 1.

Usage:  python tools/fuzzy_scale_check.py [n_strings] [k]

k=2 plants TWO deletions per dirty string (positions hashed
independently) and joins with max_dist=2 — recall must still be
exactly 1.0 (the double-delete neighborhood is lossless too).

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
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from pyspark.sql import functions as F

    from qurio_spark.operators.fuzzy import fuzzy_join
    from qurio_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-scale-check")

    t0 = time.time()
    base = spark.range(n).select(
        F.col("id").cast("long").alias("clean_id"),
        F.concat(
            F.lit("w"),
            F.conv(F.abs(F.xxhash64("id")).cast("string"), 10, 36),
        ).alias("clean_s"),
    )
    # one deletion at a hash-chosen position (1-based, within length)
    def _del_at(scol, salt):
        pos = (F.abs(F.xxhash64("clean_id", F.lit(salt))) % F.length(scol)) + F.lit(1)
        return F.concat(
            F.substring(scol, F.lit(1), pos - 1),
            scol.substr(pos + 1, F.length(scol)),
        )

    dirty = base.filter(F.col("clean_id") % 7 == 3)
    d = _del_at(F.col("clean_s"), 1)
    if k == 2:
        d = _del_at(d, 2)
    dirty = dirty.select(
        F.col("clean_id").alias("dirty_id"), d.alias("dirty_s")
    )
    base = base.persist()
    dirty = dirty.persist()
    n_clean = base.count()
    n_dirty = dirty.count()
    gen_s = time.time() - t0

    # candidate volume: pairs entering the verify (the join WITHOUT
    # the levenshtein filter)
    t0 = time.time()
    out = fuzzy_join(
        dirty, base, "dirty_id", "dirty_s", "clean_id", "clean_s",
        max_dist=k,
    ).persist()
    found = out.count()
    join_s = time.time() - t0

    planted_hit = out.filter(
        (F.col("dirty_id") == F.col("clean_id")) & (F.col("dist") <= k)
    ).count()

    # brute-force spot audit on a 1/199 slice of dirty x full clean:
    # blocked result must equal the quadratic scan exactly
    t0 = time.time()
    sl = dirty.filter(F.col("dirty_id") % 199 == 5)
    brute = (
        sl.crossJoin(base)
        .filter(F.levenshtein("dirty_s", "clean_s") <= k)
        .count()
    )
    blocked = out.join(
        sl.select("dirty_id"), "dirty_id"
    ).count()
    audit_s = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "fuzzy_scale_check",
                "k": k,
                "ok": bool(planted_hit == n_dirty and brute == blocked),
                "n_clean": n_clean,
                "n_dirty": n_dirty,
                "planted_recall": planted_hit / max(n_dirty, 1),
                "found_pairs": found,
                "brute_slice_pairs": brute,
                "blocked_slice_pairs": blocked,
                "all_pairs": n_dirty * n_clean,
                "gen_s": round(gen_s, 2),
                "join_s": round(join_s, 2),
                "audit_s": round(audit_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
