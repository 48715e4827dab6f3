"""Live HTTP fetch adapter (sources/httpfetch) against a LOCAL
http.server — the reference's crawl I/O edge (handlers/web.py:233-410)
with its failure taxonomy, hermetically tested (no external network).
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from qurio_spark.functions.resilience import (
    ERR_CRAWL_BLOCKED,
    ERR_CRAWL_REFUSED,
    ERR_EMPTY,
    ERR_INVALID_FORMAT,
    ERR_TIMEOUT,
    IngestionError,
)
from qurio_spark.sources.httpfetch import http_fetch_one

HOME = """<!doctype html>
<html><head><title>Docs Home</title></head><body>
<nav><a href="/skip">skip me</a></nav>
<h1>Welcome</h1>
<p>Read the <a href="/install">install guide</a> or the
<a href="https://ext.test/page">external page</a>.</p>
</body></html>"""


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    serve_robots = False

    def do_GET(self):
        if self.path == "/robots.txt":
            if type(self).serve_robots:
                self._send(
                    200,
                    "User-agent: *\nDisallow: /private\n",
                    "text/plain",
                )
            else:
                self.send_error(404)
        elif self.path == "/private/page":
            self._send(200, "<h1>Secret</h1>", "text/html")
        elif self.path == "/":
            self._send(200, HOME, "text/html; charset=utf-8")
        elif self.path == "/plain.md":
            self._send(200, "# Plain\n\nSee [next](/other.md).", "text/markdown")
        elif self.path == "/empty":
            self._send(200, "", "text/html")
        elif self.path == "/forbidden":
            self.send_error(403)
        elif self.path == "/flaky":
            self.send_error(503)
        elif self.path == "/notfound":
            self.send_error(404)
        elif self.path == "/latin":
            self._send(
                200, "caf\xe9 page body", "text/plain; charset=latin-1",
                encoding="latin-1",
            )
        else:
            self.send_error(404)

    def _send(self, code, body, ctype, encoding="utf-8"):
        data = body.encode(encoding)
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttpFetch:
    def test_html_page_converts_and_absolutizes_links(self, server):
        r = http_fetch_one({"url": f"{server}/"})
        assert r["title"] == "Docs Home"
        assert "# Welcome" in r["content"]
        assert "skip me" not in r["content"]  # nav boilerplate dropped
        assert f"{server}/install" in r["links"]
        assert "https://ext.test/page" in r["links"]

    def test_markdown_passthrough(self, server):
        r = http_fetch_one({"url": f"{server}/plain.md"})
        assert r["content"].startswith("# Plain")
        assert f"{server}/other.md" in r["links"]

    def test_charset_honored(self, server):
        r = http_fetch_one({"url": f"{server}/latin"})
        assert "caf\xe9" in r["content"]

    def test_failure_taxonomy(self, server):
        with pytest.raises(IngestionError) as e:
            http_fetch_one({"url": f"{server}/forbidden"})
        assert e.value.code == ERR_CRAWL_BLOCKED
        with pytest.raises(IngestionError) as e:
            http_fetch_one({"url": f"{server}/flaky"})
        assert e.value.code == ERR_TIMEOUT  # transient -> retried upstream
        with pytest.raises(IngestionError) as e:
            http_fetch_one({"url": f"{server}/notfound"})
        assert e.value.code == ERR_INVALID_FORMAT
        with pytest.raises(IngestionError) as e:
            http_fetch_one({"url": f"{server}/empty"})
        assert e.value.code == ERR_EMPTY

    def test_robots_txt_respected(self, server):
        """Reference crawls with check_robots_txt=True (web.py:277):
        a disallowed URL is a permanent BLOCKED failure; the flag
        bypass and the absent-robots allow-all are both pinned."""
        from qurio_spark.sources import httpfetch

        Handler.serve_robots = True
        httpfetch._ROBOTS_CACHE.clear()  # cache was warmed pre-robots
        try:
            with pytest.raises(IngestionError) as e:
                http_fetch_one({"url": f"{server}/private/page"})
            assert e.value.code == ERR_CRAWL_BLOCKED
            # non-disallowed path still fetches
            assert "# Welcome" in http_fetch_one({"url": f"{server}/"})["content"]
            # explicit bypass skips the gate entirely
            r = http_fetch_one(
                {"url": f"{server}/private/page"}, check_robots=False
            )
            assert "Secret" in r["content"]
        finally:
            Handler.serve_robots = False
            httpfetch._ROBOTS_CACHE.clear()

    def test_breadcrumb_path(self, server):
        r = http_fetch_one({"url": f"{server}/plain.md"})
        assert r["path"] == "plain.md"
        from qurio_spark.sources.httpfetch import breadcrumb_path

        assert breadcrumb_path("https://x.test/docs/guide/install") == (
            "docs > guide > install"
        )
        assert breadcrumb_path("https://x.test/") == ""

    def test_connection_refused_is_transient(self):
        with pytest.raises(IngestionError) as e:
            http_fetch_one({"url": "http://127.0.0.1:9/"}, timeout_s=2)
        assert e.value.code == ERR_CRAWL_REFUSED

    def test_drives_distributed_crawl(self, spark, server):
        """The adapter satisfies the crawl's fetch contract end-to-end:
        BFS over the local site, failures quarantined not fatal."""
        from qurio_spark.operators.crawl import run_crawl_distributed

        seeds = spark.createDataFrame(
            [("src", f"{server}/")], "source_id string, url string"
        )
        pages, docs = run_crawl_distributed(
            spark, seeds, http_fetch_one, max_depth=1,
            exclusions=["ext.test"],
        )
        got = {r["url"]: r for r in docs.collect()}
        assert f"{server}/" in got
        assert got[f"{server}/"]["title"] == "Docs Home"
        # /install 404s -> failed row with its taxonomy code, crawl survives
        statuses = {r["url"]: r["status"] for r in pages.collect()}
        assert statuses[f"{server}/"] == "completed"
        assert statuses.get(f"{server}/install") == "failed"


class TestUrlErrorClassification:
    """URLError taxonomy: permanent ONLY for provably-permanent reasons;
    everything unrecognized defaults to transient, matching the
    reference's retry-by-default policy (handlers/web.py maps unknown
    crawl errors to the transient timeout code — 'better to retry than
    drop')."""

    def _code(self, reason):
        import urllib.error

        from qurio_spark.sources.httpfetch import _classify_urlerror

        return _classify_urlerror(urllib.error.URLError(reason)).code

    def test_recognized_transients(self):
        import socket

        from qurio_spark.functions.resilience import (
            ERR_CRAWL_DNS,
            ERR_CRAWL_TIMEOUT,
        )

        assert self._code(socket.timeout("t")) == ERR_CRAWL_TIMEOUT
        assert self._code(socket.gaierror(8, "nodename")) == ERR_CRAWL_DNS
        assert self._code(ConnectionRefusedError(111, "refused")) == ERR_CRAWL_REFUSED
        assert self._code(ConnectionResetError(104, "reset")) == ERR_CRAWL_REFUSED

    def test_provably_permanent(self):
        import ssl

        assert self._code(ValueError("unknown url type: 'htp'")) == ERR_INVALID_FORMAT
        cert = ssl.SSLCertVerificationError(1, "certificate verify failed")
        assert self._code(cert) == ERR_INVALID_FORMAT

    def test_unknown_reasons_default_transient(self):
        import ssl

        from qurio_spark.functions.resilience import ERR_CRAWL_TIMEOUT

        assert self._code(ConnectionAbortedError(103, "aborted")) == ERR_CRAWL_TIMEOUT
        assert self._code(OSError(101, "Network is unreachable")) == ERR_CRAWL_TIMEOUT
        assert self._code(OSError(113, "No route to host")) == ERR_CRAWL_TIMEOUT
        # transient SSL handshake failure (NOT a cert-verification error)
        assert self._code(ssl.SSLError(1, "handshake failure")) == ERR_CRAWL_TIMEOUT
