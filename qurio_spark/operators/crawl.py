"""Crawl-frontier operators: link discovery (F7), cross-batch page
dedup (F8), depth gating incl. the llms.txt virtual-depth rule (S4),
page-ledger maintenance (M4) and completion detection (M6).

The reference runs a distributed BFS: each crawled page's links are
filtered (same host, http/https, fragment-stripped, exclusion regexes,
in-batch dedup, depth gate — internal/worker/link_discovery.go:8-57),
bulk-inserted with conflict-ignore (features/source/repo.go:98-137),
and re-published as depth+1 tasks (result_consumer.go:200-251).
Completion = no pending pages (result_consumer.go:253-270).

Spark shape: each BFS round is one declarative job —
  links DF -> filter chain (pure column exprs)
           -> dropDuplicates          (in-batch dedup)
           -> left-anti join vs pages (cross-batch dedup; at scale the
              pages table is partitioned by source_id so the join
              shuffles only the touched sources)
           -> union into pages
The BFS loop is bounded by max_depth, matching the reference's rounds;
fetching is a pluggable callable so tests and batch re-ingest runs stay
offline.  Two drivers share the declarative round tail
(``_advance_ledger``): ``run_crawl`` collects the frontier and fetches
driver-side (tests/small runs); ``run_crawl_distributed`` fetches via
``mapInPandas`` inside the executors with resilient_fetch semantics per
worker — the frontier never visits the driver (the 100 TB path).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df

#: result_consumer.go:206-213 — links found in an llms.txt manifest get
#: one extra depth level ("virtual depth").
LLMS_TXT_SUFFIX = "llms.txt"


def _host(url_col):
    """Host (authority) of a URL column — parse_url is JVM-side."""
    return F.parse_url(url_col, F.lit("HOST"))


def _scheme(url_col):
    return F.lower(F.regexp_extract(url_col, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1))


def strip_fragment(url_col):
    """Normalize: drop #fragment (link_discovery.go:28-30)."""
    return F.regexp_replace(url_col, r"#.*$", "")


def discover_links(
    links: DataFrame,
    max_depth_col: str = "max_depth",
    exclusions_col: str = "exclusions",
) -> DataFrame:
    """F7: the link filter chain as one declarative pass.

    Input columns: source_id, page_url (parent), link, parent_depth,
    plus ``max_depth`` and ``exclusions`` (array<string> of regexes,
    typically joined in from the sources catalog).

    Output: (source_id, url, status='pending', depth) candidate rows —
    in-batch deduped, NOT yet deduped against the pages ledger (that is
    :func:`new_frontier`'s anti-join).

    Depth gate incl. llms.txt: a manifest parent gets +1 effective max
    depth (result_consumer.go:206-213).
    """
    eff_max = F.when(
        F.col("page_url").endswith(LLMS_TXT_SUFFIX),
        F.col(max_depth_col) + 1,
    ).otherwise(F.col(max_depth_col))

    normalized = strip_fragment(F.col("link"))
    same_host = _host(F.col("link")) == _host(F.col("page_url"))
    ok_scheme = _scheme(F.col("link")).isin("http", "https")
    # exclusion regexes are Java-syntax per-row patterns; rlike needs a
    # literal, so apply them via exists() over the array column
    excluded = F.exists(
        F.col(exclusions_col), lambda ex: F.regexp_count(normalized, ex) > 0
    ) if exclusions_col else F.lit(False)

    return (
        links.filter(F.col("parent_depth") < eff_max)
        .filter(same_host & ok_scheme)
        .withColumn("url", normalized)
        .filter(~F.coalesce(excluded, F.lit(False)))
        .select(
            "source_id",
            "url",
            F.lit("pending").alias("status"),
            (F.col("parent_depth") + 1).cast("int").alias("depth"),
        )
        .dropDuplicates(["source_id", "url"])
    )


def new_frontier(candidates: DataFrame, pages: DataFrame) -> DataFrame:
    """F8: cross-batch dedup — only URLs not already in the ledger
    survive (the ON CONFLICT (source_id, url) DO NOTHING semantics,
    repo.go:98-137), via left-anti join."""
    return candidates.join(
        pages.select("source_id", "url"), ["source_id", "url"], "left_anti"
    )


def reset_stuck_pages(pages: DataFrame, now, stuck_minutes: int = 5) -> DataFrame:
    """M4 janitor: 'processing' rows older than ``stuck_minutes`` go
    back to 'pending' (source/repo.go:183-195; ticker main.go:109-123)."""
    stuck = (F.col("status") == "processing") & (
        F.col("updated_at") < F.lit(now) - F.expr(f"INTERVAL {stuck_minutes} MINUTES")
    )
    return pages.withColumn(
        "status", F.when(stuck, F.lit("pending")).otherwise(F.col("status"))
    )


def source_completion(pages: DataFrame) -> DataFrame:
    """M6: per-source status — 'completed' when nothing is pending or
    in flight; a failed depth-0 seed fails the whole source
    (result_consumer.go:105-113, :253-270)."""
    return pages.groupBy("source_id").agg(
        F.sum(
            F.when(F.col("status").isin("pending", "processing"), 1).otherwise(0)
        ).alias("in_flight"),
        F.sum(
            F.when((F.col("status") == "failed") & (F.col("depth") == 0), 1).otherwise(0)
        ).alias("seed_failed"),
    ).select(
        "source_id",
        F.when(F.col("seed_failed") > 0, F.lit("failed"))
        .when(F.col("in_flight") == 0, F.lit("completed"))
        .otherwise(F.lit("in_progress"))
        .alias("status"),
    )


FetchFn = Callable[[list[dict]], list[dict]]
#: fetcher contract: [{source_id, url, depth}] -> [{source_id, url,
#: depth, status('success'|'failed'), content, links: [str], error}]


def _status_flips(fetched: DataFrame) -> DataFrame:
    """(source_id, url, completed|failed, depth) — one ledger-update
    row per fetched page (result_consumer.go:265)."""
    return fetched.select(
        "source_id",
        "url",
        F.when(F.col("status") == "success", F.lit("completed"))
        .otherwise(F.lit("failed"))
        .alias("status"),
        "depth",
    )


def _frontier_candidates(
    pages: DataFrame, fetched: DataFrame, max_depth: int, ex_lit
) -> DataFrame:
    """The round's FRESH frontier: discover+filter links from the
    successful fetches, anti-join against the ledger."""
    links = (
        fetched.filter(F.col("status") == "success")
        .select(
            "source_id",
            F.col("url").alias("page_url"),
            F.explode_outer("links").alias("link"),
            F.col("depth").alias("parent_depth"),
        )
        .filter(F.col("link").isNotNull())
    )
    cand = discover_links(
        links.withColumn("max_depth", F.lit(max_depth)).withColumn("exclusions", ex_lit)
    )
    return new_frontier(cand, pages)


def _ledger_delta(
    pages: DataFrame, fetched: DataFrame, max_depth: int, ex_lit
) -> DataFrame:
    """The round's CHANGED ROWS ONLY — status flips plus the fresh
    frontier — the MERGE source for the persisted-ledger crawl, so the
    per-round commit rewrites O(frontier) files, never the whole
    ledger.  Keys are unique by construction: flips come from ledger
    rows, candidates are in-batch deduped and anti-joined against the
    ledger (flips included)."""
    return _status_flips(fetched).unionByName(
        _frontier_candidates(pages, fetched, max_depth, ex_lit)
    )


def _advance_ledger(pages: DataFrame, fetched: DataFrame, max_depth: int, ex_lit) -> DataFrame:
    """One BFS round's declarative tail, shared by the driver-loop and
    distributed crawls (whole-frame form — the persisted ledger uses
    :func:`_ledger_delta` + MERGE instead): flip fetched rows to
    completed/failed, discover+filter links, anti-join against the
    ledger, union the fresh frontier in."""
    pages = (
        pages.alias("p")
        .join(
            _status_flips(fetched).select(
                "source_id", "url", F.col("status").alias("new_status"),
            ),
            ["source_id", "url"],
            "left",
        )
        .select(
            "source_id",
            "url",
            F.coalesce("new_status", "status").alias("status"),
            "depth",
        )
    )
    return pages.unionByName(
        _frontier_candidates(pages, fetched, max_depth, ex_lit)
    )


#: output schema of a distributed fetch stage
FETCHED_SCHEMA = (
    "source_id string, url string, depth int, status string, content string, "
    "links array<string>, error string, title string, path string"
)


def distributed_fetch(
    frontier: DataFrame,
    fetch_one: Callable[[dict], dict],
    policy=None,
    breaker_factory: Callable[[], object] | None = None,
) -> DataFrame:
    """Fetch a frontier DataFrame INSIDE the executors (mapInPandas) —
    the scale path the driver-loop crawl's collect() can't reach: a
    million-URL frontier never visits the driver, fetch parallelism is
    the stage's task count, and results land as a distributed frame.

    ``resilient_fetch`` semantics run inside each worker: per-task
    retry/backoff via ``policy``, failure-taxonomy codes on 'failed'
    rows, and an optional circuit breaker created per partition by
    ``breaker_factory`` (per-worker breaker state, matching the
    reference's per-worker breaker globals — web.py:53-84)."""
    def fetch_partition(batches):
        import pandas as pd

        breaker = breaker_factory() if breaker_factory is not None else None
        fetch = resilient_fetch(fetch_one, policy=policy, breaker=breaker)
        cols = [
            "source_id", "url", "depth", "status", "content", "links", "error",
            "title", "path",
        ]
        for pdf in batches:
            tasks = [
                {"source_id": s, "url": u, "depth": int(d)}
                for s, u, d in zip(pdf["source_id"], pdf["url"], pdf["depth"])
            ]
            results = fetch(tasks) if tasks else []
            yield pd.DataFrame(
                {
                    "source_id": [r["source_id"] for r in results],
                    "url": [r["url"] for r in results],
                    "depth": [int(r["depth"]) for r in results],
                    "status": [r.get("status", "success") for r in results],
                    "content": [r.get("content", "") or "" for r in results],
                    "links": [r.get("links") or [] for r in results],
                    "error": [r.get("error") for r in results],
                    "title": [r.get("title", "") or "" for r in results],
                    "path": [r.get("path", "") or "" for r in results],
                },
                columns=cols,
            )

    return frontier.select("source_id", "url", "depth").mapInPandas(
        fetch_partition, FETCHED_SCHEMA
    )


def run_crawl_distributed(
    spark: SparkSession,
    seeds: DataFrame,
    fetch_one: Callable[[dict], dict],
    max_depth: int,
    exclusions: list[str] | None = None,
    max_rounds: int | None = None,
    policy=None,
    breaker_factory: Callable[[], object] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """BFS crawl with the fetch stage distributed (mapInPandas over the
    frontier).  The per-round loop is inherently driver-side (BFS round
    = stage barrier, bounded by max_depth as in the reference), but the
    frontier itself is never collected: each round is frontier-filter ->
    distributed fetch -> eager localCheckpoint (fetch exactly once) ->
    declarative ledger advance.  Returns (pages, docs) with the same
    schemas/semantics as :func:`run_crawl` — equality is pinned by
    tests/test_crawl.py."""
    ex_lit = F.array(*[F.lit(e) for e in (exclusions or [])])
    pages = seeds.select(
        "source_id",
        "url",
        F.lit("pending").alias("status"),
        F.lit(0).alias("depth"),
    )
    doc_rounds: list[DataFrame] = []
    rounds = 0
    limit = max_rounds if max_rounds is not None else max_depth + 2
    while rounds < limit:
        frontier = pages.filter(F.col("status") == "pending")
        if frontier.limit(1).count() == 0:
            break
        # eager checkpoint: the fetched frame is referenced by ledger
        # update, link discovery AND the docs output — fetch must run
        # exactly once per round
        fetched = distributed_fetch(
            frontier, fetch_one, policy=policy, breaker_factory=breaker_factory
        ).transform(lambda d: checkpoint_df(d, eager=True))
        doc_rounds.append(fetched)
        pages = checkpoint_df(
            _advance_ledger(pages, fetched, max_depth, ex_lit), eager=True
        )
        rounds += 1

    if doc_rounds:
        docs = doc_rounds[0]
        for d in doc_rounds[1:]:
            docs = docs.unionByName(d)
        docs = docs.select(
            "source_id", "url", "title", "path", "content", "links", "depth",
            "status", "error",
        )
    else:
        docs = spark.createDataFrame(
            [],
            "source_id string, url string, title string, path string, "
            "content string, links array<string>, depth int, status string, "
            "error string",
        )
    return pages, docs


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    fetch: FetchFn,
    max_depth: int,
    exclusions: list[str] | None = None,
    max_rounds: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Iterative BFS crawl driver (SURVEY §3.2 step 3's loop).

    ``seeds``: (source_id, url) depth-0 rows.  Returns (pages, docs):
    the final ledger and the fetched documents.  Each round fetches
    every pending page via ``fetch`` (a pluggable batch adapter) ON THE
    DRIVER — fine for tests and small re-ingests; the production path
    is :func:`run_crawl_distributed`, which runs the identical rounds
    with the fetch stage inside the executors.

    The loop is driver-side but bounded by max_depth (reference
    semantics: BFS rounds, radius <= max_depth+1 with manifests); all
    per-round work is distributed.
    """
    ex_lit = F.array(*[F.lit(e) for e in (exclusions or [])])
    pages = seeds.select(
        "source_id",
        "url",
        F.lit("pending").alias("status"),
        F.lit(0).alias("depth"),
    )
    all_docs: list[dict] = []
    rounds = 0
    limit = max_rounds if max_rounds is not None else max_depth + 2
    while rounds < limit:
        todo = [r.asDict() for r in pages.filter(F.col("status") == "pending").collect()]
        if not todo:
            break
        results = fetch([{k: t[k] for k in ("source_id", "url", "depth")} for t in todo])
        all_docs.extend(results)
        fetched = spark.createDataFrame(
            [
                (r["source_id"], r["url"], r.get("status", "success"), int(r["depth"]),
                 r.get("links") or [])
                for r in results
            ],
            "source_id string, url string, status string, depth int, links array<string>",
        )
        pages = checkpoint_df(
            _advance_ledger(pages, fetched, max_depth, ex_lit), eager=True
        )
        rounds += 1

    docs = spark.createDataFrame(
        [
            (
                d["source_id"], d["url"], d.get("title", ""), d.get("path", ""),
                d.get("content", ""), d.get("links") or [], int(d["depth"]),
                d.get("status", "success"), d.get("error"),
            )
            for d in all_docs
        ],
        "source_id string, url string, title string, path string, content string, "
        "links array<string>, depth int, status string, error string",
    )
    return pages, docs


def run_crawl_resumable(
    spark: SparkSession,
    seeds: DataFrame,
    fetch_one: Callable[[dict], dict],
    max_depth: int,
    ledger_path: str,
    docs_path: str,
    exclusions: list[str] | None = None,
    max_rounds: int | None = None,
    policy=None,
    breaker_factory: Callable[[], object] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`run_crawl_distributed` with the pages ledger PERSISTED
    through snapshot-table commits — the reference semantics where
    ``source_pages`` IS the resumable frontier (migrations/000010: a
    crawl interrupted mid-source resumes from the rows still
    'pending'; nothing completed refetches).  A killed driver loses
    only the round in flight: calling this again with the same paths
    continues from the committed ledger, and each round carries a
    MONOTONIC ROUND COUNTER txn-marked into BOTH tables, so a crash
    between the docs commit and the ledger commit cannot double-append
    on resume (exactly-once at the docs table).  The counter lives in
    the manifests themselves — NOT the ledger version number, which
    other commits (seed merges, maintenance) legitimately advance;
    keying the replay check on the version was the round-11 bug this
    protocol replaces.

    Round protocol (single crawl driver per ledger; OCC still guards
    against operator error), app_id = 'crawl-round:<ledger>':
      1. R = ledger txn mark + 1; frontier = pending rows of the
         committed ledger,
      2. distributed fetch (executors, resilient_fetch semantics),
      3. ``snap_append_txn(docs, app_id, batch_id=R)``,
      4. one atomic ledger MERGE of the round's changed rows only
         (status flips + fresh frontier) carrying ``txn=(app_id, R)``
         — the per-round commit rewrites the files holding the
         frontier rows (the previous round's appends), O(frontier),
         never the whole ledger.
    Crash recovery: docs mark == ledger mark + 1 means round R's
    fetches are committed but the ledger never advanced — the round
    is COMPLETED from the docs table's own committed rows (the change
    feed of the commit that wrote batch R), never refetched, so rows
    merged into the frontier between crash and resume (new seeds)
    stay pending for the next normal round instead of being marked
    fetched with their docs dropped.

    ``seeds`` merge in with conflict-ignore semantics on every call
    (repo.go:98-137): new (source_id, url) pairs enter as pending
    depth-0 rows, already-known pairs are untouched — so adding a new
    source to a finished ledger crawls just that source.

    Returns (pages, docs) DataFrames read from the committed tables —
    same schemas as :func:`run_crawl_distributed`."""
    from qurio_spark.plans.snapshots import (
        _latest_version,
        snap_append,
        snap_append_txn,
        snap_diff,
        snap_merge,
        snap_read,
        snap_txn_mark,
        snap_txn_version,
    )

    ex_lit = F.array(*[F.lit(e) for e in (exclusions or [])])
    seed_rows = seeds.select(
        "source_id",
        "url",
        F.lit("pending").alias("status"),
        F.lit(0).cast("int").alias("depth"),
    )
    if _latest_version(ledger_path) is None:
        snap_append(seed_rows, ledger_path)
    else:
        fresh = new_frontier(seed_rows, snap_read(spark, ledger_path))
        if fresh.limit(1).count() > 0:
            snap_append(fresh, ledger_path)

    app_id = f"crawl-round:{ledger_path}"
    doc_cols = [
        "source_id", "url", "title", "path", "content", "links",
        "depth", "status", "error",
    ]

    r_docs = snap_txn_mark(docs_path, app_id)
    if r_docs == snap_txn_mark(ledger_path, app_id) + 1:
        # crashed in the docs->ledger window: round r_docs is IN the
        # docs table; complete it from those committed rows, no refetch
        v_doc = snap_txn_version(docs_path, app_id, r_docs)
        if v_doc is None:
            raise RuntimeError(
                f"crawl round {r_docs} committed to {docs_path} but its "
                "version was vacuumed before the ledger advanced — "
                "re-bootstrap the ledger"
            )
        recovered = (
            snap_diff(spark, docs_path, max(v_doc - 1, 0), v_doc)
            .filter(F.col("_change") == "insert")
            .select(*doc_cols)
            if v_doc > 0
            else snap_read(spark, docs_path, 0).select(*doc_cols)
        )
        delta = _ledger_delta(
            snap_read(spark, ledger_path), recovered, max_depth, ex_lit
        )
        snap_merge(
            spark, ledger_path, delta, ["source_id", "url"],
            txn=(app_id, r_docs),
        )
        if snap_txn_mark(ledger_path, app_id) < r_docs:
            # unreachable-in-practice edge: an EMPTY delta can't commit
            # through merge — advance the marker with an empty append
            # so recovery can't re-trigger forever
            snap_append_txn(delta, ledger_path, app_id, r_docs)

    rounds = 0
    limit = max_rounds if max_rounds is not None else max_depth + 2
    while rounds < limit:
        r = snap_txn_mark(ledger_path, app_id) + 1
        pages = snap_read(spark, ledger_path)
        frontier = pages.filter(F.col("status") == "pending")
        if frontier.limit(1).count() == 0:
            break
        # eager checkpoint: the fetched frame feeds BOTH commits —
        # fetch must run exactly once per round
        fetched = distributed_fetch(
            frontier, fetch_one, policy=policy,
            breaker_factory=breaker_factory,
        ).transform(lambda d: checkpoint_df(d, eager=True))
        # docs first, ledger second: a crash in the window is healed by
        # the recovery branch above on the next call
        snap_append_txn(
            fetched.select(*doc_cols), docs_path, app_id, r,
        )
        # MERGE, not overwrite: the delta rewrites only the files
        # holding this round's frontier rows (the previous round's
        # appends) — per-round commit cost stays O(frontier) as the
        # ledger grows, never a full-table rewrite
        snap_merge(
            spark,
            ledger_path,
            _ledger_delta(pages, fetched, max_depth, ex_lit),
            ["source_id", "url"],
            txn=(app_id, r),
        )
        rounds += 1

    docs_cols = (
        "source_id string, url string, title string, path string, "
        "content string, links array<string>, depth int, status string, "
        "error string"
    )
    docs = (
        snap_read(spark, docs_path)
        if _latest_version(docs_path) is not None
        else spark.createDataFrame([], docs_cols)
    )
    return snap_read(spark, ledger_path), docs


def with_content_filter(
    fetch_one: Callable[[dict], dict],
    content_filter,
) -> Callable[[dict], dict]:
    """Compose an LLM content filter into the crawl's per-page fetch —
    the S2 boilerplate strip wired the way the reference builds its
    markdown generator per page (handlers/web.py:244-276):
    ``.txt``/``llms.txt`` pages bypass the filter, a ``None`` filter
    result (breaker open / provider failure / empty output) keeps the
    deterministic markdown, and link discovery is untouched (the
    reference discovers links from RAW markdown, web.py:152-153,
    because the filter may strip them).

    ``content_filter``: ``functions/providers.HttpContentFilter``
    shape.  Wrap BEFORE :func:`resilient_fetch` /
    :func:`run_crawl_distributed` so the filter runs inside the same
    executor task as the fetch; the instance is routed through
    :func:`~qurio_spark.functions.providers.worker_shared` so breaker
    state accumulates per executor WORKER (the reference's
    per-worker-process globals), not per task.  FAILED and empty
    fetches are never filtered — the reference only filters
    successfully fetched markdown (web.py:244-276), and a site outage
    must neither spend LLM calls nor poison the filter's breaker with
    crawl failures."""
    from qurio_spark.functions.htmlmd import _is_text_url
    from qurio_spark.functions.providers import worker_shared

    def fetch(task: dict) -> dict:
        page = fetch_one(task)
        if page.get("status", "success") != "success":
            return page
        if _is_text_url(task.get("url", "")):
            return page
        content = page.get("content") or ""
        if not content.strip():
            return page
        filtered = worker_shared(content_filter).filter_batch([content])[0]
        if filtered is not None:
            page = {**page, "content": filtered}
        return page

    return fetch


def resilient_fetch(
    fetch_one: Callable[[dict], dict],
    policy=None,
    breaker=None,
    sleep=None,
) -> FetchFn:
    """Wrap a single-page fetcher with the reference's failure
    semantics (M8 + S2): transient errors retry with exponential
    backoff; permanent errors (and exhausted retries) mark the page
    'failed' with its taxonomy code — those rows flow to the
    failed-rows quarantine (M5, operators/catalog.quarantine_failures)
    instead of aborting the crawl round.  An optional circuit breaker
    guards a flaky enrichment dependency the way the reference bypasses
    its LLM filter (web.py:53-84).

    ``fetch_one(task) -> result dict`` may raise IngestionError;
    returns a batch FetchFn for ``run_crawl``.  In a distributed fetch
    stage the same wrapper runs inside the mapInPandas worker — retry
    state is per-task, breaker state per-executor, which matches the
    reference's per-worker breaker globals.
    """
    import time as _time

    from qurio_spark.functions.resilience import QUEUE_RETRY, with_retries

    policy = policy or QUEUE_RETRY
    _sleep = sleep if sleep is not None else _time.sleep

    def fetch(tasks: list[dict]) -> list[dict]:
        out = []
        for t in tasks:
            def attempt(t=t):
                if breaker is not None and breaker.is_open():
                    raise RuntimeError("circuit open")
                return fetch_one(t)

            try:
                r = with_retries(attempt, policy, sleep=_sleep)
                if breaker is not None:
                    breaker.record_success()
                out.append({**t, "status": "success", **r})
            except Exception as e:  # noqa: BLE001 — taxonomy decided retries
                if breaker is not None:
                    breaker.record_failure()
                code = getattr(e, "code", None) or "ERR_UNKNOWN"
                out.append(
                    {**t, "status": "failed", "content": "", "links": [],
                     "error": code}
                )
        return out

    return fetch
