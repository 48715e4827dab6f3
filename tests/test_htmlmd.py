"""HTML -> markdown conversion (functions/htmlmd).

The reference gets this from crawl4ai's DefaultMarkdownGenerator and
its boilerplate-stripped fit_markdown (handlers/web.py:122-205); these
tests pin the rebuild's structural conversion, boilerplate removal,
the Arrow column form, and the crawl fetch adapter.
"""

from qurio_spark.functions.htmlmd import (
    convert_html_column,
    html_to_markdown,
    wrap_html_fetch,
)

PAGE = """
<html><head><title>Install Guide</title><style>.x{color:red}</style></head>
<body>
<nav><a href="/home">Home</a> | <a href="/docs">Docs</a></nav>
<header>Site header junk</header>
<h1>Install Guide</h1>
<p>Download the <strong>release binary</strong> and put it on your
<em>PATH</em> before the first start.</p>
<h2>Steps</h2>
<ol><li>Download</li><li>Unpack</li><li>Run <code>init</code></li></ol>
<ul><li>Linux</li><li>macOS</li></ul>
<pre>curl -fsSL https://x.test/i.sh | sh</pre>
<p>See <a href="https://x.test/docs">the docs</a> for more.</p>
<footer>copyright 2026</footer>
<script>alert(1)</script>
</body></html>
"""


class TestHtmlToMarkdown:
    def test_structure(self):
        md, title = html_to_markdown(PAGE)
        assert title == "Install Guide"
        assert "# Install Guide" in md
        assert "## Steps" in md
        assert "**release binary**" in md and "*PATH*" in md
        assert "1. Download" in md and "2. Unpack" in md
        assert "- Linux" in md and "- macOS" in md
        assert "`init`" in md
        assert "```\ncurl -fsSL https://x.test/i.sh | sh\n```" in md
        assert "[the docs](https://x.test/docs)" in md

    def test_boilerplate_dropped(self):
        md, _ = html_to_markdown(PAGE)
        assert "Home" not in md          # nav stripped
        assert "Site header junk" not in md
        assert "copyright" not in md
        assert "alert(1)" not in md
        assert "color:red" not in md

    def test_empty_and_plain(self):
        assert html_to_markdown("") == ("", None)
        md, t = html_to_markdown("just words, no tags")
        assert md == "just words, no tags" and t is None

    def test_entities_and_whitespace(self):
        md, _ = html_to_markdown("<p>a &amp; b &lt;c&gt;   \n\n d</p>")
        assert md == "a & b <c> d"

    def test_nested_list_indent(self):
        md, _ = html_to_markdown(
            "<ul><li>top</li><ul><li>inner</li></ul></ul>"
        )
        assert "- top" in md and "  - inner" in md


class TestColumnForm:
    def test_convert_html_column(self, spark):
        df = spark.createDataFrame(
            [("u1", PAGE), ("u2", "<h1>Tiny</h1><p>Body.</p>")],
            "url string, html string",
        )
        out = {r["url"]: r for r in convert_html_column(df).collect()}
        assert "# Install Guide" in out["u1"]["markdown"]
        assert out["u1"]["markdown_title"] == "Install Guide"
        assert out["u2"]["markdown"].startswith("# Tiny")
        assert out["u2"]["markdown_title"] is None


class TestCrawlAdapter:
    SITE = {
        "https://h.test/": (
            "<html><head><title>Home</title></head><body>"
            "<h1>Welcome</h1><p>Start at the "
            '<a href="https://h.test/install">install guide</a>.</p>'
            "</body></html>"
        ),
        "https://h.test/install": (
            "<html><head><title>Install</title></head><body>"
            "<h1>Install</h1><p>Run the setup script.</p></body></html>"
        ),
    }

    def test_wrapped_fetch_drives_crawl(self, spark):
        from qurio_spark.operators.crawl import run_crawl_distributed

        fetch = wrap_html_fetch(lambda task: {"html": self.SITE[task["url"]]})
        seeds = spark.createDataFrame(
            [("src", "https://h.test/")], "source_id string, url string"
        )
        pages, docs = run_crawl_distributed(spark, seeds, fetch, max_depth=1)
        got = {r["url"]: r for r in docs.collect()}
        assert set(got) == set(self.SITE)
        assert got["https://h.test/"]["title"] == "Home"
        assert "# Install" in got["https://h.test/install"]["content"]


def test_strip_tail_space_resyncs_newline_counter():
    """_strip_tail_space mutates self.out directly (rstrip/pop); the
    incremental _trailing_nl counter must be recomputed or _nl()
    over-emits newlines for later callers (pre-mode pushes raw data
    like "\\n " whose trailing newline is exposed only after the
    strip)."""
    from qurio_spark.functions.htmlmd import _MdBuilder

    b = _MdBuilder()
    b._push("x\n")
    b._push("\n ")  # raw pre-mode data: uncollapsed, space tail
    assert b._trailing_nl == 0
    b._strip_tail_space()
    assert b.out == ["x\n", "\n"]
    assert b._trailing_nl == 2  # stale 0 before the fix
    b._nl(2)  # must be a no-op now, not an over-emit
    assert "".join(b.out) == "x\n\n"

    # pop path: space-only element removed, counter re-derived from
    # the surviving tail; _has_content stays witnessed
    b2 = _MdBuilder()
    b2._push("y\n")
    b2._push("   ")
    b2._strip_tail_space()
    assert b2.out == ["y\n"]
    assert b2._trailing_nl == 1
    assert b2._has_content
