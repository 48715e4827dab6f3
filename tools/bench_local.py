#!/usr/bin/env python
"""Variance-controlled local bench: warm-up pass + median-of-N per query.

bench.py times each query ONCE, so sub-second entries swing >30%
round-over-round from JIT/ordering/page-cache noise alone (five
no-code-change entries moved >30% in round 5).  This harness is the
adjudicator: one untimed warm-up execution per query, then N timed
executions (default 3), reporting the median — a regression that
survives the median is real by construction.

Execution contract matches bench.py exactly (noop datasource sink, the
whole plan runs, nothing shipped to the driver; prepared indexes built
outside the timed region).

Usage:
    python tools/bench_local.py                    # every query, N=3
    python tools/bench_local.py ann_ivf lang_id    # subset
    SPARK_GRAFT_BENCH_REPS=5 python tools/bench_local.py ...

Prints ONE JSON line:
    {"metric": "median_query_seconds", "value": <sum of medians>,
     "unit": "sec", "reps": N, "queries": {name: median},
     "spread": {name: max-min}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from qurio_spark.session import get_spark, sf_dir


def main() -> None:
    target = sf_dir()
    sf = target.rstrip("/").rsplit("sf", 1)[-1]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark(
        app_name="qurio-spark-bench-local",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if hasattr(entrymod, "prepare_indexes"):
        try:
            entrymod.prepare_indexes(spark, target)
        except Exception as e:
            print(f"bench prepare error: {e}", file=sys.stderr)

    all_queries = entrymod.queries()
    wanted = sys.argv[1:]
    unknown = [n for n in wanted if n not in all_queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    selected = {n: all_queries[n] for n in (wanted or all_queries)}

    medians: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, fn in selected.items():
        try:
            samples: list[float] = []
            for rep in range(reps + 1):  # rep 0 = untimed warm-up
                t0 = time.time()
                fn(spark, target).write.format("noop").mode("overwrite").save()
                if rep:
                    samples.append(time.time() - t0)
            medians[name] = round(statistics.median(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
        except Exception as e:
            medians[name] = -1.0
            spread[name] = 0.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in medians.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "median_query_seconds",
                "value": total,
                "unit": "sec",
                "reps": reps,
                "queries": medians,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
