"""Validate the resumable crawl one decade above the test sites: a
deterministic ~50k-page synthetic tree crawled through the persisted
snapshot ledger (operators/crawl.run_crawl_resumable), round by round
(each call = one round = a kill/resume boundary), with a simulated
crash in the docs->ledger window mid-crawl.

Usage:  python tools/crawl_scale_check.py [n_pages] [branching]

What the numbers must show (the 100 TB posture):
  - docs EXACTLY-ONCE across every resume and the crash window:
    zero duplicate (source_id, url) docs, docs count == pages count.
  - per-round ledger commit is O(frontier), not O(|ledger|): the
    final (largest-ledger) round CARRIES almost every data file by
    manifest name and rewrites only the files holding that round's
    frontier — carried_files / rewritten_files per round printed.
  - the frontier never visits the driver: fetch runs in mapInPandas
    (run_crawl_resumable contains no collect()).

Prints one JSON line.  The committed evidence lives in SCALE.md;
tests/test_crawl.py::TestResumableCrawl pins the same contracts on a
geometry-controlled site.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BRANCHING = 37  # heap-numbered tree: depth 3 => 1+37+1369+50653 pages


def fetch_factory(branching: int, max_id: int):
    """Pure deterministic fetcher: node i links to heap children
    i*b+1 .. i*b+b capped at max_id.  Runs inside executors."""

    def fetch_one(task: dict) -> dict:
        url = task["url"]
        node = int(url.rsplit("/n", 1)[1])
        kids = [
            f"https://s.com/n{node * branching + j}"
            for j in range(1, branching + 1)
            if node * branching + j <= max_id
        ]
        return {
            "status": "success",
            "title": f"T{node}",
            "path": f"/n{node}",
            "content": f"body of node {node} " * 8,
            "links": kids,
        }

    return fetch_one


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from qurio_spark.operators.crawl import (
        distributed_fetch,
        run_crawl_resumable,
    )
    from qurio_spark.plans.snapshots import (
        _latest_version,
        _manifest_entries,
        _read_manifest,
        snap_append_txn,
        snap_read,
        snap_txn_mark,
    )
    from qurio_spark.session import get_spark

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 52060
    branching = int(sys.argv[2]) if len(sys.argv) > 2 else BRANCHING
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="crawl-scale-check",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    fetch_one = fetch_factory(branching, n_pages - 1)
    seeds = spark.createDataFrame(
        [("s1", "https://s.com/n0")], "source_id string, url string"
    )
    work = tempfile.mkdtemp(prefix="qurio-crawlscale-")
    lp, dp = f"{work}/ledger", f"{work}/docs"

    def ledger_files() -> set[str]:
        m = _read_manifest(lp, _latest_version(lp))
        return {
            (e["name"] if isinstance(e, dict) else e)
            for e in _manifest_entries(lp, m)
        }

    rounds = []
    crash_done = False
    prev_files: set[str] = set()
    t_total = time.monotonic()
    for rnd in range(10):  # one call per round = kill after each round
        # once mid-crawl: commit the docs half of the round, then
        # "die" before the ledger advances (the crash window)
        if rnd == 2 and not crash_done:
            app = f"crawl-round:{lp}"
            r = snap_txn_mark(lp, app) + 1
            frontier = snap_read(spark, lp).filter(
                F.col("status") == "pending"
            )
            fetched = distributed_fetch(frontier, fetch_one).select(
                "source_id", "url", "title", "path", "content", "links",
                "depth", "status", "error",
            )
            snap_append_txn(fetched, dp, app, r)
            crash_done = True
        t0 = time.monotonic()
        pages, docs = run_crawl_resumable(
            spark, seeds, fetch_one, max_depth=3,
            ledger_path=lp, docs_path=dp, max_rounds=1,
        )
        secs = time.monotonic() - t0
        cur = ledger_files()
        rounds.append(
            {
                "round": rnd,
                "s": round(secs, 2),
                "ledger_files": len(cur),
                "carried_files": len(cur & prev_files),
                "rewritten_or_new": len(cur - prev_files),
                **({"crash_before": True} if rnd == 2 else {}),
            }
        )
        prev_files = cur
        if pages.filter(F.col("status") == "pending").limit(1).count() == 0:
            break

    # incremental phase: one SMALL new source into the settled ledger —
    # the per-round O(frontier) claim at its sharpest: the big ledger's
    # files must carry by name, only the new source's rows commit
    big_files = ledger_files()
    seeds2 = spark.createDataFrame(
        [("s2", f"https://s.com/n{branching}")],
        "source_id string, url string",
    )
    t0 = time.monotonic()
    pages, docs = run_crawl_resumable(
        spark, seeds2, fetch_one, max_depth=3,
        ledger_path=lp, docs_path=dp,
    )
    inc_s = time.monotonic() - t0
    inc_files = ledger_files()
    inc = {
        "s": round(inc_s, 2),
        "new_source_rows": pages.filter(F.col("source_id") == "s2").count(),
        "carried_files": len(inc_files & big_files),
        "rewritten_or_new": len(inc_files - big_files),
        "big_ledger_files": len(big_files),
    }

    n_ledger = pages.filter(F.col("source_id") == "s1").count()
    n_docs = docs.filter(F.col("source_id") == "s1").count()
    dupes = (
        docs.groupBy("source_id", "url").count().filter("count > 1").count()
    )
    statuses = {
        r["status"]: r["cnt"]
        for r in pages.filter(F.col("source_id") == "s1")
        .groupBy("status").agg(F.count("*").alias("cnt")).collect()
    }
    last = rounds[-1]
    # heap numbering is dense: depth<=3 nodes are exactly ids
    # 0..(b^0+b^1+b^2+b^3)-1, capped by max_id
    expected = min(n_pages, sum(branching**d for d in range(4)))
    out = {
        "n_pages": expected,
        "branching": branching,
        "total_s": round(time.monotonic() - t_total, 2),
        "rounds": rounds,
        "ledger_rows": n_ledger,
        "docs_rows": n_docs,
        "dup_docs": dupes,
        "statuses": statuses,
        "incremental": inc,
        "ok": (
            dupes == 0
            and n_docs == n_ledger == expected
            and statuses.get("completed", 0) == expected
            # the last (largest-ledger) round carried most files
            and last["carried_files"] > last["rewritten_or_new"]
            # and the small-source increment left the big ledger alone
            and inc["carried_files"] >= inc["big_ledger_files"] - 2
            and inc["new_source_rows"] == 1 + branching + branching**2
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
