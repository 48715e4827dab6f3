"""S3: sitemap discovery — urlset parse + recursive sitemapindex.

Reference semantics (``apps/ingestion-worker/handlers/sitemap.py:192-306``):
fetch ``{base}/sitemap.xml``; a ``<urlset>`` yields page ``<loc>`` URLs,
a ``<sitemapindex>`` yields sub-sitemap URLs resolved recursively with
depth <= 3; results are same-domain filtered against the base host and
deduplicated.  Fetch failures / non-XML return [] for that branch.

Spark-first shape: the *parse + filter + dedup* is a DataFrame pipeline
over (base_url, xml) rows using ``regexp_extract_all`` (so the semantics
are expressible in ANSI SQL and oracle-checkable); only the breadth-wise
*fetch* of each recursion round is an injected adapter.  At scale the
frontier of sub-sitemaps is itself a DataFrame, so a million-sitemap
crawl distributes: each round is one ``mapInPandas``-style fetch over the
frontier partitioned across executors — here the fetcher is driver-side
and mockable because network I/O is an adapter, not an engine op.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

MAX_SITEMAP_INDEX_DEPTH = 3

# <loc> bodies, whitespace-trimmed.  Kept identical between the pure-
# Python parser, the Spark column expression, and the SQL oracle.
LOC_RE = r"<loc>\s*(.*?)\s*</loc>"
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]+)"


def classify_sitemap(xml: str) -> str:
    """'urlset' | 'sitemapindex' | 'unknown' from the root tag."""
    if xml is None:
        return "unknown"
    m = re.search(r"<\s*(?:\w+:)?(urlset|sitemapindex)[\s>]", xml)
    return m.group(1) if m else "unknown"


def extract_locs(xml: str) -> list[str]:
    """All <loc> URL bodies in document order (pure, engine-portable)."""
    if not xml:
        return []
    return [m.strip() for m in re.findall(LOC_RE, xml)]


def sitemap_page_urls(sitemaps: DataFrame) -> DataFrame:
    """urlset rows (source_id, base_url, xml) -> distinct same-domain
    page URLs (source_id, url).

    The whole chain is column expressions — regexp extract, explode,
    host-equality filter, distinct — so Catalyst pushes it down and it
    scales to any number of sitemap documents.
    """
    locs = sitemaps.select(
        "source_id",
        "base_url",
        F.explode(F.regexp_extract_all("xml", F.lit(LOC_RE), F.lit(1))).alias("loc"),
    )
    return (
        locs.withColumn("url", F.trim("loc"))
        .filter(
            (F.regexp_extract("url", HOST_RE, 1) != "")
            & (
                F.regexp_extract("url", HOST_RE, 1)
                == F.regexp_extract("base_url", HOST_RE, 1)
            )
        )
        .select("source_id", "url")
        .distinct()
    )


def discover_sitemap_urls(
    spark: SparkSession,
    base_url: str,
    fetch: Callable[[str], str | None],
    max_depth: int = MAX_SITEMAP_INDEX_DEPTH,
) -> list[str]:
    """Full S3 discovery for one site: fetch {base}/sitemap.xml, recurse
    through sitemapindex docs breadth-first (depth <= max_depth), return
    deduped same-domain page URLs.

    ``fetch(url) -> xml | None`` is the injected I/O adapter (None =
    fetch failure, matching the reference's []-on-error).  Each
    recursion round's parse/filter runs as the DataFrame pipeline above.
    """
    base_host_m = re.match(HOST_RE, base_url)
    if not base_host_m:
        return []
    sitemap_url = base_url.rstrip("/") + "/sitemap.xml"

    frontier = [sitemap_url]
    seen_sitemaps: set[str] = set()
    page_urls: list[str] = []
    depth = 0
    while frontier and depth <= max_depth:
        docs = []
        next_frontier: list[str] = []
        for sm_url in frontier:
            if sm_url in seen_sitemaps:
                continue
            seen_sitemaps.add(sm_url)
            xml = fetch(sm_url)
            if not xml or not xml.strip():
                continue
            kind = classify_sitemap(xml)
            if kind == "urlset":
                docs.append(("s", base_url, xml))
            elif kind == "sitemapindex":
                next_frontier.extend(extract_locs(xml))
        if docs:
            df = spark.createDataFrame(
                docs, "source_id string, base_url string, xml string"
            )
            page_urls.extend(r["url"] for r in sitemap_page_urls(df).collect())
        frontier = next_frontier
        depth += 1
    return sorted(set(page_urls))
