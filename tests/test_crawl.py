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
