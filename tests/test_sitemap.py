"""S3 sitemap discovery tests (mirrors reference
apps/ingestion-worker/tests/test_sitemap_handler.py behavior table:
urlset parse, recursive index, domain filter, dedup, error branches)."""

from qurio_spark.sources.sitemap import (
    classify_sitemap,
    discover_sitemap_urls,
    extract_locs,
    sitemap_page_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://docs.example.com/a</loc></url>
  <url><loc>
    https://docs.example.com/b
  </loc></url>
  <url><loc>https://docs.example.com/a</loc></url>
  <url><loc>https://other.example.org/x</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://docs.example.com/sm1.xml</loc></sitemap>
  <sitemap><loc>https://docs.example.com/sm2.xml</loc></sitemap>
</sitemapindex>"""

SM1 = """<urlset><url><loc>https://docs.example.com/p1</loc></url></urlset>"""
SM2 = """<urlset><url><loc>https://docs.example.com/p2</loc></url>
<url><loc>https://evil.example.net/p3</loc></url></urlset>"""


def test_classify():
    assert classify_sitemap(URLSET) == "urlset"
    assert classify_sitemap(INDEX) == "sitemapindex"
    assert classify_sitemap("<html>nope</html>") == "unknown"
    assert classify_sitemap(None) == "unknown"


def test_extract_locs_trims_and_orders():
    assert extract_locs(URLSET) == [
        "https://docs.example.com/a",
        "https://docs.example.com/b",
        "https://docs.example.com/a",
        "https://other.example.org/x",
    ]
    assert extract_locs("") == []


def test_page_urls_domain_filter_and_dedup(spark):
    df = spark.createDataFrame(
        [("s1", "https://docs.example.com", URLSET)],
        "source_id string, base_url string, xml string",
    )
    urls = sorted(r["url"] for r in sitemap_page_urls(df).collect())
    assert urls == ["https://docs.example.com/a", "https://docs.example.com/b"]


def test_discover_recurses_index(spark):
    site = {
        "https://docs.example.com/sitemap.xml": INDEX,
        "https://docs.example.com/sm1.xml": SM1,
        "https://docs.example.com/sm2.xml": SM2,
    }
    got = discover_sitemap_urls(spark, "https://docs.example.com", site.get)
    assert got == [
        "https://docs.example.com/p1",
        "https://docs.example.com/p2",
    ]


def test_discover_depth_cap(spark):
    # self-referencing index: recursion must stop at max depth, and the
    # seen-set must prevent refetching
    loop = """<sitemapindex><sitemap>
      <loc>https://a.com/sitemap.xml</loc></sitemap></sitemapindex>"""
    calls = []

    def fetch(u):
        calls.append(u)
        return loop

    assert discover_sitemap_urls(spark, "https://a.com", fetch) == []
    assert calls == ["https://a.com/sitemap.xml"]


def test_discover_fetch_failure_returns_empty(spark):
    assert discover_sitemap_urls(spark, "https://a.com", lambda u: None) == []
    assert discover_sitemap_urls(spark, "not a url", lambda u: URLSET) == []
