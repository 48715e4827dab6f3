"""SQL-callable operator surface (SURVEY §4's deferred ergonomics item,
VERDICT r14 next-round #8): lets a SQL user invoke engine operators
that Spark SQL cannot express natively — hybrid search, BM25, ANN —
as TABLE FUNCTIONS inside an otherwise ordinary query:

    fns = SqlFunctions(spark)
    fns.register("hybrid_search", lambda spark, query, k=10, alpha=0.5:
                 hybrid_search(docs, query, qvec, alpha=alpha, limit=k))
    df = fns.sql('''
        SELECT doc_id, score
        FROM hybrid_search('vector similarity', k => 10, alpha => 0.5)
        WHERE score > 0.1
    ''')

Why a Python-side rewrite and not ``spark.sql.extensions``: a real
parser/analyzer rule must be compiled JVM code on the driver classpath
at session START (a Scala/Java build artifact this pure-Python repo
does not ship), and Python UDTFs — the other native table-function
path — execute row-at-a-time on executors WITHOUT a SparkSession, so
they cannot run a distributed search plan.  The rewrite keeps the
operator's full DataFrame plan (Catalyst sees the same tree as the
Python API; the driver-window ``hybrid_topk`` oracle pins the SQL
route end-to-end) at the cost of recognizing the call syntactically.

The recognizer is deliberately narrow and documented: a registered
name followed by a parenthesized argument list of LITERALS — strings
(single- OR double-quoted, with SQL quote-doubling and backslash
escapes, matching Spark's default lexer where both quote characters
delimit strings and ``escapedStringLiterals`` is off), numbers,
booleans, NULL — positionally or as ``name => value``.  It never
touches text inside SQL string literals or comments (``--`` and
nested ``/* */`` are skipped, so a name mentioned in a comment is
never executed), never rewrites unregistered names, and fails loudly
on malformed argument lists.  Each call becomes a session-local
temp view that is dropped as soon as ``spark.sql`` has ANALYZED the
query (the analyzed plan owns the view's subtree; long sessions leak
nothing).

Reference parity: the Go backend exposes search only through typed
RPC handlers (apps/backend/internal/handlers/search.go); a SQL surface
is beyond-parity ergonomics, so its scope — literals in, one relation
out — is ours to define.
"""

from __future__ import annotations

import itertools
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_VIEW_IDS = itertools.count()


class SqlFunctionError(ValueError):
    """Malformed call to a registered SQL table function."""


#: Spark's default lexer treats BOTH quote characters as string
#: delimiters (identifiers use backticks) and honors backslash escapes
#: (``escapedStringLiterals`` defaults to false) alongside SQL
#: quote-doubling — the scanner must agree with it on string
#: boundaries or the rewriter could touch text inside a literal.
_QUOTES = "'\""


def _scan_literal(text: str, i: int) -> int:
    """Return the index just past the SQL string literal opening at
    ``text[i]`` (a single OR double quote).  Handles quote-doubling
    and backslash escapes, matching Spark's default string lexing."""
    q = text[i]
    n = len(text)
    i += 1
    while i < n:
        c = text[i]
        if c == "\\":
            i += 2
            continue
        if c == q:
            if i + 1 < n and text[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    raise SqlFunctionError("unterminated string literal in SQL text")


def _scan_backtick(text: str, i: int) -> int:
    """Index just past the backtick-quoted identifier opening at
    ``text[i]``.  Spark escapes a backtick inside one by doubling it.
    Scanned so that quote characters or ``--``/``/*`` INSIDE an
    identifier are never mistaken for strings or comments."""
    n = len(text)
    i += 1
    while i < n:
        if text[i] == "`":
            if i + 1 < n and text[i + 1] == "`":
                i += 2
                continue
            return i + 1
        i += 1
    raise SqlFunctionError("unterminated backtick identifier in SQL text")


def _scan_comment(text: str, i: int) -> int:
    """Index just past the SQL comment opening at ``text[i]``, or
    ``i`` unchanged when no comment opens there.  ``-- ...`` runs to
    end of line; ``/* ... */`` nests (Spark accepts nested bracketed
    comments)."""
    if text.startswith("--", i):
        j = text.find("\n", i)
        return len(text) if j < 0 else j + 1
    if text.startswith("/*", i):
        depth, j, n = 1, i + 2, len(text)
        while j < n and depth:
            if text.startswith("/*", j):
                depth, j = depth + 1, j + 2
            elif text.startswith("*/", j):
                depth, j = depth - 1, j + 2
            else:
                j += 1
        if depth:
            raise SqlFunctionError("unterminated block comment in SQL text")
        return j
    return i


def _find_calls(sql: str, names: set[str]):
    """Yield (start, end, name, argtext) for every registered-name call
    outside string literals AND comments, with balanced parens (both
    scans are string- and comment-aware)."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in _QUOTES:
            i = _scan_literal(sql, i)
            continue
        if c == "`":
            i = _scan_backtick(sql, i)
            continue
        j = _scan_comment(sql, i)
        if j != i:
            i = j
            continue
        m = _IDENT.match(sql, i)
        if not m:
            i += 1
            continue
        word = m.group(0)
        j = m.end()
        # a word is a CALL only if its lowercase form is registered,
        # it is not preceded by an identifier char or '.', and the
        # next non-space char is '('
        prev = sql[i - 1] if i > 0 else " "
        if word.lower() not in names or prev.isalnum() or prev in "_.":
            i = j
            continue
        k = j
        while k < n:
            if sql[k].isspace():
                k += 1
                continue
            cj = _scan_comment(sql, k)  # name /* c */ (args) is valid
            if cj != k:
                k = cj
                continue
            break
        if k >= n or sql[k] != "(":
            i = j
            continue
        depth, k0 = 0, k
        while k < n:
            ch = sql[k]
            if ch in _QUOTES:
                k = _scan_literal(sql, k)
                continue
            if ch == "`":
                k = _scan_backtick(sql, k)
                continue
            cj = _scan_comment(sql, k)
            if cj != k:
                k = cj
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    yield (i, k + 1, word.lower(), sql[k0 + 1 : k])
                    break
            k += 1
        else:
            raise SqlFunctionError(f"unbalanced parens in {word}(...) call")
        i = k + 1


def _split_args(argtext: str) -> list[str]:
    """Split on top-level commas, string/backtick/comment-aware.
    Comment text is EXCISED from the returned tokens (replaced by one
    space so it still separates words) — Spark accepts a comment
    anywhere whitespace goes, so ``'q' /* top-k */, 2`` must parse."""
    parts, buf, depth, i, n = [], [], 0, 0, len(argtext)
    while i < n:
        c = argtext[i]
        if c in _QUOTES:
            j = _scan_literal(argtext, i)
            buf.append(argtext[i:j])
            i = j
            continue
        if c == "`":
            j = _scan_backtick(argtext, i)
            buf.append(argtext[i:j])
            i = j
            continue
        j = _scan_comment(argtext, i)
        if j != i:
            buf.append(" ")
            i = j
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    tail = "".join(buf)
    if tail.strip() or parts:
        parts.append(tail)
    return parts


#: common backslash escapes, decoded the way Spark's unescapeSQLString
#: does; ``\uXXXX`` and octal ``\NNN`` are handled below, and an
#: unrecognized ``\x`` drops the backslash and keeps ``x`` (also
#: Spark's rule)
_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "0": "\0"}
_HEX = set("0123456789abcdefABCDEF")
_OCT = set("01234567")


def _decode_string(body: str, q: str) -> str:
    out, i, n = [], 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            nxt = body[i + 1]
            if nxt == "u" and i + 5 < n and all(
                ch in _HEX for ch in body[i + 2 : i + 6]
            ):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt in _OCT:
                j = i + 1
                while j < min(i + 4, n) and body[j] in _OCT:
                    j += 1
                code = int(body[i + 1 : j], 8)
                if code <= 0xFF:
                    out.append(chr(code))
                    i = j
                    continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if c == q and i + 1 < n and body[i + 1] == q:
            out.append(q)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _parse_value(tok: str):
    t = tok.strip()
    if not t:
        raise SqlFunctionError("empty argument in table-function call")
    if t[0] in _QUOTES:
        end = _scan_literal(t, 0)
        if end != len(t):
            raise SqlFunctionError(f"trailing text after string: {tok!r}")
        return _decode_string(t[1:-1], t[0])
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    if low == "null":
        return None
    if _NUM.match(t):
        return float(t) if ("." in t or "e" in low) else int(t)
    raise SqlFunctionError(
        f"argument {tok!r} is not a literal (only strings, numbers, "
        "booleans and NULL are allowed in SQL table-function calls)"
    )


def parse_args(argtext: str):
    """-> (positional list, keyword dict) from a call's argument text.
    Keywords use the SQL named-argument arrow: ``name => value``."""
    pos, kw = [], {}
    for raw in _split_args(argtext):
        if not raw.strip():
            raise SqlFunctionError("empty argument in table-function call")
        m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=>\s*(.+)$", raw, re.S)
        if m:
            kw[m.group(1)] = _parse_value(m.group(2))
        else:
            if kw:
                raise SqlFunctionError(
                    "positional argument after keyword argument"
                )
            pos.append(_parse_value(raw))
    return pos, kw


class SqlFunctions:
    """Per-session registry of SQL table functions backed by DataFrame
    builders.  ``register`` binds a name to ``fn(spark, *args, **kw) ->
    DataFrame``; ``sql`` rewrites each call into a temp view and runs
    the query on the plain SparkSession."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._fns: dict[str, Callable[..., DataFrame]] = {}

    def register(self, name: str, fn: Callable[..., DataFrame]) -> None:
        if not _IDENT.fullmatch(name):
            raise SqlFunctionError(f"invalid function name {name!r}")
        self._fns[name.lower()] = fn

    def sql(self, query: str) -> DataFrame:
        from qurio_spark.operators.cachectl import propagate_caches

        calls = list(_find_calls(query, set(self._fns)))
        views: list[str] = []
        built: list[DataFrame] = []
        out, last = [], 0
        try:
            for start, end, name, argtext in calls:
                pos, kw = parse_args(argtext)
                df = self._fns[name](self._spark, *pos, **kw)
                if not isinstance(df, DataFrame):
                    raise SqlFunctionError(
                        f"{name} returned {type(df).__name__}, not a DataFrame"
                    )
                view = f"_qsql_{name}_{next(_VIEW_IDS)}"
                df.createOrReplaceTempView(view)
                views.append(view)
                built.append(df)
                out.append(query[last:start])
                out.append(view)
                last = end
            out.append(query[last:])
            # spark.sql analyzes eagerly: after this returns, the plan
            # owns the view subtrees and the views can be dropped.
            # Cache handles a builder attached to its frame
            # (operators/cachectl — e.g. curate's bucketed prefix-sum
            # cache) move to the returned frame: the builder's wrapper
            # object is discarded here, and without the hand-off the
            # persist would outlive any release path.
            result = self._spark.sql("".join(out))
            for df in built:
                propagate_caches(df, result)
            return result
        finally:
            for view in views:
                self._drop_view(view)

    def _drop_view(self, view: str) -> None:
        """Remove the temp-view NAME BINDING only.  The public
        ``catalog.dropTempView`` cascades an uncache through every
        cached plan the view's subtree contains (probed on 4.1: it
        unpersists a builder's own ``.persist()``-ed frame even when
        the view is a projection OVER it), which would silently strip
        the caches operators attach for single-evaluation
        (operators/cachectl) BEFORE the analyzed result ever executes.
        The internal SessionCatalog drop is binding-only; the handles
        propagated onto the returned frame stay the release path."""
        try:
            self._spark._jsparkSession.sessionState().catalog().dropTempView(view)
        except Exception:  # internals moved: correctness over caching
            self._spark.catalog.dropTempView(view)
