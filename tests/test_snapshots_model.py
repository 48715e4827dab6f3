"""Model-based integration test for the snapshot table format: a
seeded pseudo-random schedule of appends / overwrites / range deletes /
value replaces / compactions / vacuums runs against BOTH the real
table and a plain in-memory multiset model — after every operation the
latest version must equal the model exactly.  One test, many
cross-feature interactions (two-level manifests, CoW delete,
replaceWhere, compaction, vacuum reachability) that the per-feature
tests cannot compose."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from qurio_spark.plans.snapshots import (
    snap_append,
    snap_compact,
    snap_delete_where,
    snap_overwrite,
    snap_read,
    snap_replace_values,
    snap_vacuum,
)


def _read_multiset(spark, path) -> Counter:
    return Counter(
        (r["k"], r["v"]) for r in snap_read(spark, path).collect()
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_random_schedule_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"model{seed}")
    model: Counter = Counter()
    next_id = [0]

    def batch(n):
        rows = []
        for _ in range(n):
            rows.append((rng.randrange(8), next_id[0]))
            next_id[0] += 1
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k int, v int")

    # op 0 must create the table
    first = batch(6)
    snap_append(df_of(first).coalesce(1), path)
    model.update(first)

    for step in range(24):
        op = rng.choice(
            ["append", "append", "delete", "replace", "overwrite",
             "compact", "vacuum"]
        )
        if op == "append":
            rows = batch(rng.randrange(1, 7))
            snap_append(df_of(rows).coalesce(1), path)
            model.update(rows)
        elif op == "overwrite":
            rows = batch(rng.randrange(1, 7))
            snap_overwrite(df_of(rows).coalesce(1), path)
            model = Counter(rows)
        elif op == "delete":
            lo = rng.randrange(0, 2000)
            hi = lo + rng.randrange(0, 400)
            snap_delete_where(spark, path, "v", lo=lo, hi=hi)
            model = Counter(
                {kv: n for kv, n in model.items() if not lo <= kv[1] <= hi}
            )
        elif op == "replace":
            ks = sorted(rng.sample(range(8), rng.randrange(1, 3)))
            repl = [(k, next_id[0] + i) for i, k in enumerate(ks)]
            next_id[0] += len(repl)
            snap_replace_values(
                spark, path, "k", ks, df_of(repl).coalesce(1),
                cluster=rng.random() < 0.5,
            )
            model = Counter(
                {kv: n for kv, n in model.items() if kv[0] not in ks}
            )
            model.update(repl)
        elif op == "compact":
            snap_compact(spark, path, small_bytes=64 << 20)
        elif op == "vacuum":
            snap_vacuum(path, keep_last=rng.randrange(1, 3))
        got = _read_multiset(spark, path)
        assert got == model, f"seed {seed} diverged at step {step} ({op})"
