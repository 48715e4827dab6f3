"""Crawl-frontier operators: link filter chain (F7), cross-batch dedup
(F8), llms.txt virtual depth (S4), stuck reset (M4), completion (M6),
and the iterative BFS driver.

The filter matrix mirrors link_discovery_test.go / FIXTURES.md §4.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.crawl import (
    discover_links,
    new_frontier,
    reset_stuck_pages,
    run_crawl,
    source_completion,
)

LINK_SCHEMA = (
    "source_id string, page_url string, link string, parent_depth int, "
    "max_depth int, exclusions array<string>"
)


def _discover(spark, rows):
    return {
        (r["url"], r["depth"])
        for r in discover_links(spark.createDataFrame(rows, LINK_SCHEMA)).collect()
    }


class TestLinkFilterChain:
    BASE = "https://docs.example.com/guide"

    def test_filter_matrix(self, spark):
        mk = lambda link, depth=0, maxd=2, ex=None: (
            "s1", self.BASE, link, depth, maxd, ex or []
        )
        got = _discover(
            spark,
            [
                mk("https://docs.example.com/a"),          # kept
                mk("http://docs.example.com/b"),           # kept (http ok)
                mk("https://other.example.com/c"),         # external host
                mk("mailto:x@example.com"),                # bad scheme
                mk("ftp://docs.example.com/f"),            # bad scheme
                mk("https://docs.example.com/a#frag"),     # dup modulo fragment
                mk("https://docs.example.com/blog/post", ex=[r".*/blog/.*"]),
                mk("https://docs.example.com/deep", depth=2, maxd=2),  # depth gate
                mk("/relative/path"),                      # relative -> no host
            ],
        )
        assert got == {
            ("https://docs.example.com/a", 1),
            ("http://docs.example.com/b", 1),
        }

    def test_llms_txt_virtual_depth(self, spark):
        # parent at depth == max_depth discovers nothing... unless it is
        # an llms.txt manifest (+1 allowance, result_consumer.go:206-213)
        plain = ("s1", "https://d.com/page", "https://d.com/x", 1, 1, [])
        manifest = ("s1", "https://d.com/llms.txt", "https://d.com/y", 1, 1, [])
        got = _discover(spark, [plain, manifest])
        assert got == {("https://d.com/y", 2)}

    def test_in_batch_dedup(self, spark):
        rows = [
            ("s1", self.BASE, "https://docs.example.com/a", 0, 2, []),
            ("s1", self.BASE, "https://docs.example.com/a", 0, 2, []),
        ]
        assert len(_discover(spark, rows)) == 1


class TestFrontier:
    def test_cross_batch_dedup(self, spark):
        cand = spark.createDataFrame(
            [("s1", "u1", "pending", 1), ("s1", "u2", "pending", 1)],
            "source_id string, url string, status string, depth int",
        )
        pages = spark.createDataFrame(
            [("s1", "u1", "completed", 0)],
            "source_id string, url string, status string, depth int",
        )
        fresh = new_frontier(cand, pages).collect()
        assert [(r["url"]) for r in fresh] == ["u2"]


class TestLedger:
    def test_stuck_reset(self, spark):
        now = datetime(2026, 1, 1, 12, 0, 0)
        pages = spark.createDataFrame(
            [
                ("s1", "old", "processing", 0, now - timedelta(minutes=10)),
                ("s1", "new", "processing", 0, now - timedelta(minutes=2)),
                ("s1", "done", "completed", 0, now - timedelta(minutes=60)),
            ],
            "source_id string, url string, status string, depth int, updated_at timestamp",
        )
        out = {r["url"]: r["status"] for r in reset_stuck_pages(pages, now).collect()}
        assert out == {"old": "pending", "new": "processing", "done": "completed"}

    def test_completion_states(self, spark):
        pages = spark.createDataFrame(
            [
                ("done", "a", "completed", 0),
                ("done", "b", "failed", 1),      # non-seed failure still completes
                ("busy", "c", "pending", 1),
                ("dead", "d", "failed", 0),      # seed failure -> source failed
            ],
            "source_id string, url string, status string, depth int",
        )
        out = {r["source_id"]: r["status"] for r in source_completion(pages).collect()}
        assert out == {"done": "completed", "busy": "in_progress", "dead": "failed"}


SITE = {
    "https://d.com/": ["https://d.com/a", "https://d.com/b", "https://other.com/x"],
    "https://d.com/a": ["https://d.com/deep"],
    "https://d.com/b": [],
    "https://d.com/deep": ["https://d.com/deeper"],
    "https://d.com/deeper": [],
}


def fake_fetch(tasks):
    out = []
    for t in tasks:
        links = SITE.get(t["url"])
        if links is None:
            out.append({**t, "status": "failed", "error": "404", "content": "", "links": []})
        else:
            out.append({**t, "status": "success", "content": f"# Page {t['url']}\n\nBody of {t['url']} page.",
                        "links": links, "title": t["url"]})
    return out


class TestCrawlDriver:
    def test_bfs_rounds_and_depth_gate(self, spark):
        seeds = spark.createDataFrame([("s1", "https://d.com/")], "source_id string, url string")
        pages, docs = run_crawl(spark, seeds, fake_fetch, max_depth=2)
        ledger = {r["url"]: (r["status"], r["depth"]) for r in pages.collect()}
        # depth 0 seed, depth 1 a/b, depth 2 deep; 'deeper' (depth 3) gated
        assert ledger == {
            "https://d.com/": ("completed", 0),
            "https://d.com/a": ("completed", 1),
            "https://d.com/b": ("completed", 1),
            "https://d.com/deep": ("completed", 2),
        }
        assert docs.count() == 4
        # termination: everything fetched exactly once
        assert docs.select("url").distinct().count() == 4

    def test_failed_page_recorded(self, spark):
        seeds = spark.createDataFrame(
            [("s1", "https://d.com/missing")], "source_id string, url string"
        )
        pages, docs = run_crawl(spark, seeds, fake_fetch, max_depth=1)
        assert pages.collect()[0]["status"] == "failed"
        comp = source_completion(pages).collect()[0]
        assert comp["status"] == "failed"  # seed failure


class TestResilientFetch:
    def test_transient_retries_then_crawl_succeeds(self, spark):
        from qurio_spark.functions.resilience import IngestionError, RetryPolicy
        from qurio_spark.operators.crawl import resilient_fetch, run_crawl

        attempts = {}

        def flaky(task):
            n = attempts.setdefault(task["url"], 0)
            attempts[task["url"]] = n + 1
            if n < 2:
                raise IngestionError("ERR_CRAWL_TIMEOUT")
            return {"content": "# Page\n\nok", "links": [], "title": "Page"}

        seeds = spark.createDataFrame(
            [("s1", "https://a.com/")], "source_id string, url string"
        )
        fetch = resilient_fetch(flaky, RetryPolicy(3, 0.0), sleep=lambda s: None)
        pages, docs = run_crawl(spark, seeds, fetch, max_depth=0)
        assert attempts["https://a.com/"] == 3
        assert pages.filter("status = 'completed'").count() == 1
        assert docs.filter("status = 'success'").count() == 1

    def test_permanent_failure_quarantines(self, spark):
        from qurio_spark.functions.resilience import IngestionError
        from qurio_spark.operators.catalog import quarantine_failures
        from qurio_spark.operators.crawl import resilient_fetch, run_crawl

        def broken(task):
            raise IngestionError("ERR_INVALID_FORMAT", "not html")

        seeds = spark.createDataFrame(
            [("s1", "https://a.com/")], "source_id string, url string"
        )
        fetch = resilient_fetch(broken, sleep=lambda s: None)
        pages, docs = run_crawl(spark, seeds, fetch, max_depth=0)
        assert pages.filter("status = 'failed'").count() == 1
        dlq = quarantine_failures(spark, docs)
        rows = dlq.collect()
        assert len(rows) == 1
        assert rows[0]["error"] == "ERR_INVALID_FORMAT"
        import json as _json
        payload = _json.loads(rows[0]["payload"])
        assert payload["url"] == "https://a.com/"  # replayable original task

    def test_breaker_short_circuits_after_threshold(self, spark):
        from qurio_spark.functions.resilience import CircuitBreaker, IngestionError, RetryPolicy
        from qurio_spark.operators.crawl import resilient_fetch

        calls = []

        def down(task):
            calls.append(task["url"])
            raise IngestionError("ERR_CRAWL_REFUSED")

        br = CircuitBreaker(threshold=2, cooldown_s=300, clock=lambda: 0.0)
        fetch = resilient_fetch(down, RetryPolicy(1, 0.0), breaker=br, sleep=lambda s: None)
        tasks = [{"source_id": "s1", "url": f"https://a.com/{i}", "depth": 0} for i in range(5)]
        out = fetch(tasks)
        assert all(r["status"] == "failed" for r in out)
        assert len(calls) == 2  # breaker opened after 2 failures; rest short-circuit


def fake_fetch_one(task):
    """Single-page twin of fake_fetch (module-level so Spark can pickle
    it into mapInPandas workers)."""
    from qurio_spark.functions.resilience import IngestionError

    links = SITE.get(task["url"])
    if links is None:
        raise IngestionError("ERR_HTTP_404", "404 not found")
    return {
        "content": f"# Page {task['url']}\n\nBody of {task['url']} page.",
        "links": links,
        "title": task["url"],
    }


class TestDistributedCrawl:
    def _canon_pages(self, pages):
        return sorted(
            (r["source_id"], r["url"], r["status"], r["depth"]) for r in pages.collect()
        )

    def _canon_docs(self, docs):
        return sorted(
            (r["source_id"], r["url"], r["status"], r["depth"], r["content"],
             tuple(r["links"] or []))
            for r in docs.collect()
        )

    def test_matches_driver_loop_crawl(self, spark):
        """Ledger AND docs from the mapInPandas fetch stage must be
        identical to the driver-loop path on the same site fixture."""
        from qurio_spark.operators.crawl import resilient_fetch, run_crawl_distributed

        seeds = spark.createDataFrame(
            [("s1", "https://d.com/")], "source_id string, url string"
        )
        ref_pages, ref_docs = run_crawl(
            spark, seeds, resilient_fetch(fake_fetch_one), max_depth=2
        )
        dist_pages, dist_docs = run_crawl_distributed(
            spark, seeds, fake_fetch_one, max_depth=2
        )
        assert self._canon_pages(dist_pages) == self._canon_pages(ref_pages)
        assert self._canon_docs(dist_docs) == self._canon_docs(ref_docs)

    def test_failed_seed_distributed(self, spark):
        from qurio_spark.operators.crawl import run_crawl_distributed

        seeds = spark.createDataFrame(
            [("s1", "https://d.com/missing")], "source_id string, url string"
        )
        pages, docs = run_crawl_distributed(spark, seeds, fake_fetch_one, max_depth=1)
        assert pages.collect()[0]["status"] == "failed"
        d = docs.collect()[0]
        assert d["status"] == "failed" and d["error"] == "ERR_HTTP_404"

    def test_fetch_runs_in_executors_not_driver(self, spark):
        """The frontier must reach the fetch callable via worker
        processes: assert the fetched frame is produced by a
        mapInPandas stage (plan check), not a driver collect."""
        from qurio_spark.operators.crawl import distributed_fetch

        frontier = spark.createDataFrame(
            [("s1", "https://d.com/", "pending", 0)],
            "source_id string, url string, status string, depth int",
        )
        plan = distributed_fetch(frontier, fake_fetch_one)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan


def flaky_fetch_one(task):
    """Module-level (picklable) fetcher that always fails with a
    TRANSIENT code — exercises worker-side retry + breaker."""
    from qurio_spark.functions.resilience import IngestionError

    raise IngestionError("ERR_CRAWL_TIMEOUT", "synthetic timeout")


class TestDistributedBreaker:
    def test_breaker_and_retries_inside_workers(self, spark):
        """A frontier of always-timing-out URLs: every page comes back
        'failed' with its taxonomy code (retries exhausted inside the
        executors, zero-backoff policy) and the crawl still terminates
        with a consistent ledger — failures never kill tasks."""
        from qurio_spark.functions.resilience import CircuitBreaker, RetryPolicy
        from qurio_spark.operators.crawl import run_crawl_distributed

        seeds = spark.createDataFrame(
            [("s1", f"https://x.com/{i}") for i in range(6)],
            "source_id string, url string",
        )
        pages, docs = run_crawl_distributed(
            spark,
            seeds,
            flaky_fetch_one,
            max_depth=1,
            policy=RetryPolicy(max_attempts=2, initial_delay_s=0.0, max_delay_s=0.0),
            breaker_factory=lambda: CircuitBreaker(threshold=3, cooldown_s=60.0),
        )
        ledger = pages.collect()
        assert len(ledger) == 6
        assert all(r["status"] == "failed" for r in ledger)
        d = docs.collect()
        assert len(d) == 6
        # some rows fail on the taxonomy code, later ones may fail fast
        # on the opened breaker — both are recorded failures
        assert {r["error"] for r in d} <= {"ERR_CRAWL_TIMEOUT", "ERR_UNKNOWN"}
        assert any(r["error"] == "ERR_CRAWL_TIMEOUT" for r in d)


class TestResumableCrawl:
    """run_crawl_resumable: the pages ledger persisted through
    snapshot-table commits — reference semantics where source_pages IS
    the resumable frontier (migrations/000010).  A killed crawl
    resumes from the committed ledger; the round-scoped docs txn makes
    the crash window between the two commits exactly-once."""

    def _canon_pages(self, pages):
        return sorted(
            (r["source_id"], r["url"], r["status"], r["depth"])
            for r in pages.collect()
        )

    def _canon_docs(self, docs):
        return sorted(
            (r["source_id"], r["url"], r["status"], r["depth"], r["content"])
            for r in docs.collect()
        )

    def _seeds(self, spark):
        return spark.createDataFrame(
            [("s1", "https://d.com/")], "source_id string, url string"
        )

    def test_kill_resume_equals_uninterrupted(self, spark, tmp_path):
        """Run round-by-round (killed after every round) and compare
        the final ledger + docs with one uninterrupted distributed
        run on the same site."""
        from qurio_spark.operators.crawl import (
            run_crawl_distributed,
            run_crawl_resumable,
        )

        ref_pages, ref_docs = run_crawl_distributed(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2
        )
        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        for _ in range(5):  # one round per call = kill after each round
            pages, docs = run_crawl_resumable(
                spark, self._seeds(spark), fake_fetch_one, max_depth=2,
                ledger_path=lp, docs_path=dp, max_rounds=1,
            )
        assert self._canon_pages(pages) == self._canon_pages(ref_pages)
        assert self._canon_docs(docs) == self._canon_docs(ref_docs)
        # frontier drained: a further resume is a no-op (no commits)
        from qurio_spark.plans.snapshots import _latest_version

        v = _latest_version(lp)
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp,
        )
        assert _latest_version(lp) == v

    def _simulate_crash_window(self, spark, lp, dp):
        """Run the docs half of a round exactly as run_crawl_resumable
        does (real fetch of the pending frontier, round-counter txn),
        then 'die' before the ledger overwrite.  Returns the docs row
        count at the crash point."""
        from qurio_spark.operators.crawl import distributed_fetch
        from qurio_spark.plans.snapshots import (
            snap_append_txn,
            snap_read,
            snap_txn_mark,
        )

        app = f"crawl-round:{lp}"
        r = snap_txn_mark(lp, app) + 1
        frontier = snap_read(spark, lp).filter(F.col("status") == "pending")
        fetched = distributed_fetch(frontier, fake_fetch_one).select(
            "source_id", "url", "title", "path", "content", "links",
            "depth", "status", "error",
        )
        assert snap_append_txn(fetched, dp, app, r) is not None
        return snap_read(spark, dp).count()

    def test_crash_between_docs_and_ledger_commit(self, spark, tmp_path):
        """The crash window: docs committed, ledger not yet advanced.
        On resume the round is COMPLETED from the committed docs rows
        — never refetched, never appended a second time."""
        from qurio_spark.operators.crawl import run_crawl_resumable

        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        # round 0 completes normally
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp, max_rounds=1,
        )
        docs_rows_after_crash = self._simulate_crash_window(spark, lp, dp)
        # resume: recovery advances the ledger from the committed rows
        pages, docs = run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp,
        )
        urls_in_docs = [
            r["url"] for r in docs.groupBy("url").count()
            .filter("count > 1").collect()
        ]
        assert urls_in_docs == []  # no page appended twice
        # and the crawl still completed the whole reachable site
        # (deeper sits at depth 3, past max_depth=2's link gate)
        assert {r["url"] for r in pages.collect()} == set(SITE) - {
            "https://d.com/deeper"
        }
        assert docs.count() >= docs_rows_after_crash

    def test_ledger_advance_rewrites_only_frontier_files(
        self, spark, tmp_path
    ):
        """The per-round ledger commit is a MERGE of the changed rows
        — files holding only already-completed pages carry by name
        with their bytes untouched, so per-round cost is O(frontier)
        as the ledger grows, never a full rewrite."""
        import os

        from qurio_spark.operators.crawl import run_crawl_resumable
        from qurio_spark.plans.snapshots import (
            _latest_version,
            _manifest_entries,
            _read_manifest,
        )

        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        for _ in range(2):
            run_crawl_resumable(
                spark, self._seeds(spark), fake_fetch_one, max_depth=2,
                ledger_path=lp, docs_path=dp, max_rounds=1,
            )
        m = _read_manifest(lp, _latest_version(lp))
        settled = {}  # completed-only files: next round must not touch
        for e in _manifest_entries(lp, m):
            name = e["name"] if isinstance(e, dict) else e
            full = os.path.join(lp, name)
            pend = (
                spark.read.parquet(full)
                .filter(F.col("status") == "pending")
                .count()
            )
            if pend == 0:
                settled[name] = os.path.getmtime(full)
        assert settled  # two rounds in, some files are fully settled
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp, max_rounds=1,
        )
        m2 = _read_manifest(lp, _latest_version(lp))
        names = {
            (e["name"] if isinstance(e, dict) else e)
            for e in _manifest_entries(lp, m2)
        }
        for name, mt in settled.items():
            assert name in names  # carried, not rewritten
            assert os.path.getmtime(os.path.join(lp, name)) == mt

    def test_seed_merge_between_crash_and_resume(self, spark, tmp_path):
        """Round-11 regression: the txn batch id used to be the LEDGER
        VERSION, so any ledger commit between a crash in the
        docs->ledger window and the resume (here: merging a new seed
        source, the documented resume-with-more-seeds usage) bumped the
        version past the marker and the refetched round DOUBLE-APPENDED
        every in-flight page.  The round counter + recovery path must
        keep docs exactly-once AND still crawl the new source."""
        from qurio_spark.operators.crawl import run_crawl_resumable

        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp, max_rounds=1,
        )
        self._simulate_crash_window(spark, lp, dp)
        # resume WITH an extra seed source: the merge commits a new
        # ledger version before the recovery round
        both = spark.createDataFrame(
            [("s1", "https://d.com/"), ("s2", "https://d.com/b")],
            "source_id string, url string",
        )
        pages, docs = run_crawl_resumable(
            spark, both, fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp,
        )
        dupes = (
            docs.groupBy("source_id", "url").count()
            .filter("count > 1").collect()
        )
        assert dupes == []  # the in-flight round did not double-append
        by_src = {(r["source_id"], r["url"]) for r in pages.collect()}
        assert ("s2", "https://d.com/b") in by_src
        assert {u for s, u in by_src if s == "s1"} == set(SITE) - {
            "https://d.com/deeper"
        }
        # the new seed's doc landed too (it was pending during
        # recovery, fetched by the following normal round)
        assert ("s2", "https://d.com/b") in {
            (r["source_id"], r["url"]) for r in docs.collect()
        }

    def test_new_source_added_to_finished_ledger(self, spark, tmp_path):
        """Conflict-ignore seed merge: adding a second source to a
        completed ledger crawls only the new source's pages."""
        from qurio_spark.operators.crawl import run_crawl_resumable

        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp,
        )
        both = spark.createDataFrame(
            [("s1", "https://d.com/"), ("s2", "https://d.com/b")],
            "source_id string, url string",
        )
        pages, docs = run_crawl_resumable(
            spark, both, fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp,
        )
        by_src = {
            (r["source_id"], r["url"]) for r in pages.collect()
        }
        assert ("s2", "https://d.com/b") in by_src
        # s1's rows unchanged (one per reachable page, completed)
        s1 = [s for s in by_src if s[0] == "s1"]
        assert len(s1) == len(SITE) - 1  # deeper is past the depth gate


class TestVacuumedCrashWindow:
    """ADVICE r11 medium: if the commit that wrote round R's docs is
    vacuumed during the crash window, a LATER unrelated commit still
    carries the txn mark — recovery must hit the documented
    re-bootstrap error, never silently replay the wrong commit's diff
    (which would lose round R's status flips and double-append its
    pages on the next round)."""

    def _seeds(self, spark):
        return spark.createDataFrame(
            [("s1", "https://d.com/")], "source_id string, url string"
        )

    def test_resume_raises_when_introducing_commit_vacuumed(
        self, spark, tmp_path
    ):
        from qurio_spark.operators.crawl import run_crawl_resumable
        from qurio_spark.plans.snapshots import snap_compact, snap_vacuum

        lp, dp = str(tmp_path / "ledger"), str(tmp_path / "docs")
        run_crawl_resumable(
            spark, self._seeds(spark), fake_fetch_one, max_depth=2,
            ledger_path=lp, docs_path=dp, max_rounds=1,
        )
        TestResumableCrawl._simulate_crash_window(None, spark, lp, dp)
        # unrelated maintenance commit carries the txn map forward...
        snap_compact(spark, dp, small_bytes=64 << 20)
        # ...and retention removes the commit that actually wrote the
        # in-flight round
        snap_vacuum(dp, keep_last=1, grace_seconds=0.0)
        with pytest.raises(RuntimeError, match="vacuumed"):
            run_crawl_resumable(
                spark, self._seeds(spark), fake_fetch_one, max_depth=2,
                ledger_path=lp, docs_path=dp,
            )
