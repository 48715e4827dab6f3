"""Live HTTP fetch adapter for the crawl (S1's I/O edge).

The crawl keeps fetching pluggable (operators/crawl: tests and batch
re-ingest stay offline); this module provides the real implementation
— stdlib urllib, no extra dependencies — with the reference's failure
taxonomy (handlers/web.py:233-410 maps crawl4ai failures to
ERR_CRAWL_* codes; here the mapping is from HTTP/socket errors):

  - timeouts                 -> ERR_CRAWL_TIMEOUT   (transient: retried)
  - DNS failures             -> ERR_CRAWL_DNS       (transient)
  - connection refused/reset -> ERR_CRAWL_REFUSED   (transient)
  - HTTP 429/5xx             -> ERR_TIMEOUT-class transient retry
  - HTTP 401/403             -> ERR_CRAWL_BLOCKED   (permanent)
  - other HTTP errors        -> ERR_INVALID_FORMAT-class permanent
  - empty body               -> ERR_EMPTY

HTML responses convert through functions/htmlmd (the crawl4ai
fit_markdown role) with relative links absolutized against the final
URL; text/markdown bodies pass through with markdown link discovery.

``http_fetch_one`` satisfies the ``fetch_one(task) -> result`` contract
of ``resilient_fetch``/``run_crawl_distributed``, so retries, breaker
state, quarantine, and the ledger all apply unchanged.  Tested against
a local http.server — no network in CI.
"""

from __future__ import annotations

import re
import socket
import urllib.error
import urllib.parse
import urllib.request

from qurio_spark.functions.htmlmd import html_to_markdown
from qurio_spark.functions.resilience import (
    ERR_CRAWL_BLOCKED,
    ERR_CRAWL_DNS,
    ERR_CRAWL_REFUSED,
    ERR_CRAWL_TIMEOUT,
    ERR_EMPTY,
    ERR_INVALID_FORMAT,
    ERR_TIMEOUT,
    IngestionError,
)

DEFAULT_TIMEOUT_S = 20.0
DEFAULT_MAX_BYTES = 10 * 1024 * 1024
USER_AGENT = "qurio-spark-crawler/1.0"

_MD_LINK = re.compile(r"\[[^\]]*\]\(([^)\s]+)\)")

#: per-process robots.txt cache — in a distributed fetch stage this is
#: per-executor, matching the reference's per-worker crawler state
_ROBOTS_CACHE: dict[str, object] = {}


def _robots_allows(url: str, user_agent: str, open_, timeout_s: float) -> bool:
    """robots.txt gate (reference crawls with check_robots_txt=True,
    handlers/web.py:277).  Unreachable/absent robots.txt allows all,
    per the de-facto standard; the parsed file is cached per host."""
    from urllib.robotparser import RobotFileParser

    parts = urllib.parse.urlsplit(url)
    base = f"{parts.scheme}://{parts.netloc}"
    rp = _ROBOTS_CACHE.get(base)
    if rp is None:
        rp = RobotFileParser()
        try:
            req = urllib.request.Request(
                f"{base}/robots.txt", headers={"User-Agent": user_agent}
            )
            with open_(req, timeout=timeout_s) as resp:
                body = resp.read(64 * 1024).decode("utf-8", errors="replace")
            rp.parse(body.splitlines())
        except Exception:  # noqa: BLE001 — any failure to fetch = allow all
            rp.allow_all = True
        _ROBOTS_CACHE[base] = rp
    return rp.can_fetch(user_agent, url)


def breadcrumb_path(url: str) -> str:
    """URL path segments joined ' > ' — the reference's breadcrumb
    derivation (handlers/web.py:176-179)."""
    parts = urllib.parse.urlsplit(url)
    return " > ".join(s for s in parts.path.split("/") if s)


def _classify_urlerror(e: urllib.error.URLError) -> IngestionError:
    import ssl

    reason = getattr(e, "reason", None)
    if isinstance(reason, socket.timeout) or isinstance(e, TimeoutError):
        return IngestionError(ERR_CRAWL_TIMEOUT, str(e))
    if isinstance(reason, socket.gaierror):
        return IngestionError(ERR_CRAWL_DNS, str(e))
    if isinstance(reason, (ConnectionRefusedError, ConnectionResetError)):
        return IngestionError(ERR_CRAWL_REFUSED, str(e))
    # Permanent only for provably-permanent reasons: a malformed URL
    # ("unknown url type") or a certificate that fails verification
    # can never succeed on retry, so don't burn the retry/breaker
    # budget on them.
    if isinstance(reason, (ValueError, ssl.SSLCertVerificationError)):
        return IngestionError(ERR_INVALID_FORMAT, str(e))
    # Everything else (ConnectionAbortedError, OSError
    # host/network-unreachable during a blip, transient SSL handshake
    # failures, ...) defaults to transient — the reference classifier
    # retries unknown crawl errors rather than dropping them
    # (handlers/web.py: unknown -> ERR_CRAWL_TIMEOUT, "better to retry
    # than drop").
    return IngestionError(ERR_CRAWL_TIMEOUT, str(e))


def http_fetch_one(
    task: dict,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    user_agent: str = USER_AGENT,
    opener=None,
    check_robots: bool = True,
) -> dict:
    """Fetch one page -> ``{"content": markdown, "links": [...],
    "title": ...}`` or raise a taxonomy-coded IngestionError.

    ``opener``: an alternative ``urlopen``-compatible callable (tests
    inject none — they run a real local http.server — but embedders
    may want a pooled opener)."""
    url = task["url"]
    open_ = opener or urllib.request.urlopen
    if check_robots and not _robots_allows(url, user_agent, open_, timeout_s):
        raise IngestionError(ERR_CRAWL_BLOCKED, "blocked by robots.txt")
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        resp = open_(req, timeout=timeout_s)
    except urllib.error.HTTPError as e:
        if e.code in (401, 403):
            raise IngestionError(ERR_CRAWL_BLOCKED, f"HTTP {e.code}") from e
        if e.code == 429 or e.code >= 500:
            # transient server side: retryable
            raise IngestionError(ERR_TIMEOUT, f"HTTP {e.code}") from e
        raise IngestionError(ERR_INVALID_FORMAT, f"HTTP {e.code}") from e
    except (urllib.error.URLError, TimeoutError, socket.timeout) as e:
        if isinstance(e, urllib.error.URLError):
            raise _classify_urlerror(e) from e
        raise IngestionError(ERR_CRAWL_TIMEOUT, str(e)) from e

    with resp:
        final_url = resp.geturl() or url
        ctype = (resp.headers.get("Content-Type") or "").lower()
        body = resp.read(max_bytes + 1)
    if len(body) > max_bytes:
        raise IngestionError(ERR_INVALID_FORMAT, "response exceeds max_bytes")
    if not body.strip():
        raise IngestionError(ERR_EMPTY, "empty response body")

    charset = "utf-8"
    m = re.search(r"charset=([\w.-]+)", ctype)
    if m:
        charset = m.group(1)
    try:
        text = body.decode(charset, errors="replace")
    except LookupError:
        text = body.decode("utf-8", errors="replace")

    is_html = "html" in ctype or text.lstrip()[:512].lower().startswith(
        ("<!doctype html", "<html")
    )
    if is_html:
        md, title = html_to_markdown(text)
        raw_links = _MD_LINK.findall(md)
    else:
        md, title = text, None
        raw_links = _MD_LINK.findall(text)
    if not md.strip():
        raise IngestionError(ERR_EMPTY, "no text content after conversion")

    links = []
    seen = set()
    for l in raw_links:
        absu = urllib.parse.urljoin(final_url, l)
        if absu.startswith(("http://", "https://")) and absu not in seen:
            seen.add(absu)
            links.append(absu)
    return {
        "content": md,
        "links": links,
        "title": title or url,
        "path": breadcrumb_path(url),
    }
