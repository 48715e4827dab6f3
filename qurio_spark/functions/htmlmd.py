"""Hermetic HTML -> markdown conversion (stdlib html.parser).

The reference delegates this to crawl4ai's DefaultMarkdownGenerator
(handlers/web.py:11,122-205) and prefers its boilerplate-stripped
``fit_markdown``; this rebuild owns the same two behaviors:

  - structural conversion: headings, paragraphs, links, emphasis,
    inline/fenced code, ordered/unordered lists, blockquotes;
  - boilerplate removal: script/style and the nav/header/footer/aside
    landmark containers are dropped entirely (the fit_markdown
    behavior the reference relies on, web.py:188-205).

Pure Python on purpose: it runs inside the distributed fetch stage
(operators/crawl.run_crawl_distributed), so it must not need codecs or
network.  ``convert_html_column`` is the Arrow-batched column form.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP = {"script", "style", "nav", "header", "footer", "aside", "noscript"}
_BLOCK_BREAK = {"p", "div", "section", "article", "table", "tr"}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}


class _MdBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self.title: str | None = None
        self._skip_depth = 0
        self._in_title = False
        self._in_pre = False
        self._href: str | None = None
        self._link_text: list[str] = []
        self._list_stack: list[tuple[str, int]] = []  # (kind, counter)
        # incremental trailing-newline count / any-content flag so _nl()
        # never has to re-join the whole buffer (pages are up to 10 MB)
        self._trailing_nl = 0
        self._has_content = False

    # -- emit helpers ------------------------------------------------
    def _push(self, s: str) -> None:
        if not s:
            return
        self.out.append(s)
        stripped = len(s) - len(s.rstrip("\n"))
        if stripped == len(s):
            self._trailing_nl += stripped
        else:
            self._trailing_nl = stripped
        if s.strip():
            self._has_content = True

    def _nl(self, n: int = 2) -> None:
        if not self._has_content:
            return
        while self._trailing_nl < n:
            self._push("\n")

    def _emit(self, s: str) -> None:
        if self._href is not None:
            self._link_text.append(s)
        else:
            self._push(s)

    def _strip_tail_space(self) -> None:
        buf = self._link_text if self._href is not None else self.out
        changed = False
        while buf and buf[-1].endswith(" "):
            buf[-1] = buf[-1].rstrip(" ")
            changed = True
            if buf[-1] == "":
                buf.pop()
        # Direct self.out mutation bypasses _push's bookkeeping: resync
        # _trailing_nl so _nl() keeps its invariant (e.g. inside <pre>,
        # raw "x\n " is pushed uncollapsed with _trailing_nl=0; after
        # the strip it ends in "\n").  _has_content needs no resync —
        # only space-only elements are ever popped, so a True flag
        # stays witnessed by an earlier element.
        if changed and buf is self.out:
            nl = 0
            for s in reversed(self.out):
                t = len(s) - len(s.rstrip("\n"))
                nl += t
                if t != len(s):
                    break
            self._trailing_nl = nl

    # -- parser hooks ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
        elif tag in _HEADINGS:
            self._nl()
            self._emit("#" * _HEADINGS[tag] + " ")
        elif tag == "a":
            self._href = dict(attrs).get("href") or ""
            self._link_text = []
        elif tag in ("strong", "b"):
            self._emit("**")
        elif tag in ("em", "i"):
            self._emit("*")
        elif tag == "code" and not self._in_pre:
            self._emit("`")
        elif tag == "pre":
            self._nl()
            self._emit("```\n")
            self._in_pre = True
        elif tag == "blockquote":
            self._nl()
            self._emit("> ")
        elif tag in ("ul", "ol"):
            self._list_stack.append((tag, 0))
        elif tag == "li":
            self._nl(1)
            depth = max(len(self._list_stack) - 1, 0)
            kind, n = (self._list_stack[-1] if self._list_stack else ("ul", 0))
            if kind == "ol":
                n += 1
                self._list_stack[-1] = (kind, n)
                self._emit("  " * depth + f"{n}. ")
            else:
                self._emit("  " * depth + "- ")
        elif tag == "br":
            self._emit("\n")
        elif tag in _BLOCK_BREAK:
            self._nl()

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
        elif tag in _HEADINGS or tag in _BLOCK_BREAK or tag == "blockquote":
            self._nl()
        elif tag == "a":
            text = "".join(self._link_text).strip() or self._href or ""
            href = self._href or ""
            self._href = None
            self._push(f"[{text}]({href}) ")
        elif tag in ("strong", "b"):
            self._strip_tail_space()
            self._emit("** ")
        elif tag in ("em", "i"):
            self._strip_tail_space()
            self._emit("* ")
        elif tag == "code" and not self._in_pre:
            self._strip_tail_space()
            self._emit("` ")
        elif tag == "pre":
            self._in_pre = False
            self._emit("\n```")
            self._nl()
        elif tag in ("ul", "ol"):
            if self._list_stack:
                self._list_stack.pop()
            self._nl()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            t = data.strip()
            if t and self.title is None:
                self.title = t
            return
        if self._in_pre:
            self._emit(data)
            return
        collapsed = " ".join(data.split())
        if collapsed:
            self._emit(collapsed + " ")


def html_to_markdown(html: str) -> tuple[str, str | None]:
    """-> (markdown, title).  Boilerplate containers dropped, structure
    converted; whitespace normalized to at most one blank line."""
    b = _MdBuilder()
    b.feed(html or "")
    b.close()
    md = "".join(b.out)
    # tidy: strip trailing spaces per line, collapse 3+ newlines
    lines = [ln.rstrip() for ln in md.splitlines()]
    out: list[str] = []
    for ln in lines:
        if ln == "" and out and out[-1] == "":
            continue
        out.append(ln)
    return "\n".join(out).strip(), b.title


def _is_text_url(url: str) -> bool:
    """The reference's LLM-filter bypass for plain-text resources
    (web.py:245-246: ``.txt`` and ``llms.txt`` skip the filter — the
    manifest format must survive verbatim).  The check runs on the URL
    PATH, so a query string or fragment (``/llms.txt?v=2``) cannot
    defeat the bypass (ADVICE r11)."""
    from urllib.parse import urlsplit

    return urlsplit(url or "").path.endswith(".txt")


def convert_html_column(
    df,
    html_col: str = "html",
    out_col: str = "markdown",
    content_filter=None,
    url_col: str | None = None,
):
    """Arrow-batched column form: adds ``out_col`` (markdown) and
    ``{out_col}_title`` next to the input columns.

    ``content_filter``: an optional LLM boilerplate filter
    (``functions/providers.HttpContentFilter`` shape —
    ``filter_batch(texts) -> [str | None]``) applied AFTER the
    deterministic conversion, ONE provider call per ``max_batch``
    slice of the Arrow batch, never per row.  ``None`` entries
    (breaker open, provider failure, empty filter output) keep the
    deterministic markdown — the reference's raw-markdown fallback
    (web.py:196-203).  ``url_col`` enables the reference's text-file
    bypass: rows whose URL ends in ``.txt`` (incl. ``llms.txt``) are
    never sent to the filter (web.py:245-252).  Absent filter (the
    default) this is byte-identical to the deterministic path."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _conv(s, urls=None):
        mds, titles = [], []
        for h in s:
            md, title = html_to_markdown(h or "")
            mds.append(md)
            titles.append(title)
        if content_filter is not None:
            idxs = [
                i for i in range(len(mds))
                if urls is None or not _is_text_url(urls.iloc[i])
            ]
            if idxs:
                from qurio_spark.functions.providers import worker_shared

                # per-worker singleton: breaker state must span tasks,
                # not reset with each task's pickled copy
                filtered = worker_shared(content_filter).filter_batch(
                    [mds[i] for i in idxs]
                )
                for i, ftext in zip(idxs, filtered):
                    if ftext is not None:
                        mds[i] = ftext
        return pd.DataFrame({"md": mds, "title": titles})

    schema = T.StructType(
        [
            T.StructField("md", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
    if url_col is not None:
        _conv.__annotations__ = {
            "s": pd.Series, "urls": pd.Series, "return": pd.DataFrame,
        }
        udf = F.pandas_udf(schema)(_conv)
        tmp = df.withColumn("_conv", udf(F.col(html_col), F.col(url_col)))
    else:
        def _conv1(s):
            return _conv(s)

        _conv1.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
        udf = F.pandas_udf(schema)(_conv1)
        tmp = df.withColumn("_conv", udf(F.col(html_col)))
    return (
        tmp.withColumn(out_col, F.col("_conv.md"))
        .withColumn(f"{out_col}_title", F.col("_conv.title"))
        .drop("_conv")
    )


def wrap_html_fetch(fetch_html):
    """Adapt a raw-HTML fetcher to the crawl's fetch contract: the
    wrapped callable converts the page to markdown, pulls the title
    from <title>, and discovers links from the converted markdown —
    the same []( ) link regex the reference applies to crawl4ai's raw
    markdown (web.py:152-160)."""
    import re

    def fetch(task):
        page = fetch_html(task)
        html = page.get("html", "")
        md, title = html_to_markdown(html)
        links = [
            l for l in re.findall(r"\[[^\]]*\]\(([^)]+)\)", md)
            if l.startswith(("http://", "https://", "/"))
        ]
        return {
            "content": md,
            "links": links,
            "title": title or page.get("title") or task["url"],
        }

    return fetch
