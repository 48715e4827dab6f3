"""Crawl-frontier fixtures/queries (F7/F8/M6), window/set-op/percentile
breadth, curation and sharding queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from qurio_spark.functions.frames import local_frame
from qurio_spark.functions.numeric import stable_round

from .common import (
    QUERY_TEXT,
    QUERY_VEC_ID,
    _docs_with_vecs,
    _epoch_secs,
    _events,
    _normalize_events_ts,
    _qvec,
    _t,
)

from qurio_spark.operators.dedup import exact_dedup


# --------------------------------------------------------------------------

#: q_export_shards' per-process output dir (mkdtemp once, wiped+
#: recreated per call — see its docstring)
_EXPORT_DIR = None

_LINK_FIXTURE = [
    # (source_id, page_url, link, parent_depth, max_depth)
    ("s1", "https://docs.example.com/guide", "https://docs.example.com/a", 0, 2),
    ("s1", "https://docs.example.com/guide", "http://docs.example.com/b", 0, 2),
    ("s1", "https://docs.example.com/guide", "https://other.example.com/c", 0, 2),
    ("s1", "https://docs.example.com/guide", "mailto:x@example.com", 0, 2),
    ("s1", "https://docs.example.com/guide", "ftp://docs.example.com/f", 0, 2),
    ("s1", "https://docs.example.com/guide", "https://docs.example.com/a#frag", 0, 2),
    ("s1", "https://docs.example.com/guide", "https://docs.example.com/blog/post", 0, 2),
    ("s1", "https://docs.example.com/deep", "https://docs.example.com/d", 2, 2),
    ("s1", "https://docs.example.com/llms.txt", "https://docs.example.com/m", 2, 2),
    ("s2", "https://api.example.org/", "https://api.example.org/ref", 1, 3),
]
_LINK_EXCLUSION = ".*/blog/.*"

_PAGE_FIXTURE = [
    # (source_id, url, status, depth)
    ("done", "https://a.com/", "completed", 0),
    ("done", "https://a.com/x", "failed", 1),
    ("busy", "https://b.com/", "completed", 0),
    ("busy", "https://b.com/y", "pending", 1),
    ("dead", "https://c.com/", "failed", 0),
]


def q_link_filter_chain(spark, sf_dir):
    """F7 + S4: link-discovery filter chain (same-host, scheme,
    fragment-strip, exclusion regex, in-batch dedup, depth gate with
    the llms.txt +1 allowance) over a deterministic fixture."""
    from qurio_spark.operators.crawl import discover_links

    links = local_frame(spark, 
        [(sid, pu, l, pd_, md, [_LINK_EXCLUSION]) for sid, pu, l, pd_, md in _LINK_FIXTURE],
        "source_id string, page_url string, link string, parent_depth int, "
        "max_depth int, exclusions array<string>",
    )
    return discover_links(links)


def q_source_completion(spark, sf_dir):
    """M6: per-source completion/failed derivation from the page
    ledger (seed failure fails the source)."""
    from qurio_spark.operators.crawl import source_completion

    pages = local_frame(spark, 
        _PAGE_FIXTURE, "source_id string, url string, status string, depth int"
    )
    return source_completion(pages)


def q_events_sessions(spark, sf_dir):
    """Sessionization: 30-minute-gap sessions per user (lag + cumulative
    sum of gap flags), with per-session stats — the batch twin of a
    session-window streaming agg."""
    ev = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _epoch_secs(ev)
    gapped = ev.withColumn(
        "new_session",
        F.when(
            secs - F.lag(secs).over(w_user) > 30 * 60,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # value sums run in INTEGER CENTS (floor(v*100+0.5), summed as
    # longs, divided once at the end): integer addition is
    # order-invariant, so Spark's partial-agg order can never flip a
    # rounding boundary against the oracle (r11 flake class).
    return (
        gapped.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100.0 + F.lit(0.5))
            ).alias("session_cents"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            (F.sum("session_cents") / 100.0).alias("total_value"),
        )
    )


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast revenue (pure filter + agg; PushedFilters
    should carry every predicate to the scan)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_events_pivot(spark, sf_dir):
    """PIVOT: per-user event counts spread across event-type columns
    (explicit value list so the plan is a single pass, no distinct-scan
    planning step)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
        .na.fill(0, _EVENT_TYPES)
    )


def q_events_cube(spark, sf_dir):
    """CUBE aggregation over (event_type, hour-of-day): all four
    grouping combinations in one partial-agg-friendly pass — the
    grouping-sets sibling of the ROLLUP query (``revenue_rollup``).
    ``F.hour`` is field extraction, so it is timezone-free on the NTZ
    events ``ts`` (see functions/events_ts.py)."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hr", F.hour("ts"))
        .cube("event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
        # grouping-marker NULLs -> sentinels (same convention as
        # revenue_rollup: the hash compare sorts row tuples)
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("hr", F.lit(-1)).alias("hr"),
            "n",
            "total_value",
        )
    )


def q_events_histogram(spark, sf_dir):
    """Two-pass equi-width histogram of event values: pass 1 computes
    the global [min, max] (one 1-row agg, broadcast back as a scalar
    cross join); pass 2 buckets every row into 10 bins and counts —
    the ANALYZE/profiling shape.  The max lands in the last bin
    (half-open bins with a closed top edge, both engines)."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    n_bins = 10
    binned = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_bins)
            ).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        stable_round(F.min("value"), 2).alias("bin_min"),
        stable_round(F.max("value"), 2).alias("bin_max"),
    )


def q_events_unpivot(spark, sf_dir):
    """UNPIVOT (melt): the wide per-user count matrix from
    ``q_events_pivot`` back to long form — wide-to-long is the
    missing half of the reshape pair, and running it over the pivot
    output exercises both in one oracle-checked pass (absent combos
    surface as explicit zero rows)."""
    wide = q_events_pivot(spark, sf_dir)
    return wide.unpivot("user_id", _EVENT_TYPES, "event_type", "n")


def q_events_setops(spark, sf_dir):
    """Set operations: users who clicked but never purchased
    (EXCEPT/anti set) union users who did both (INTERSECT), tagged."""
    ev = _events(spark, sf_dir)
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    click_only = clickers.exceptAll(buyers).withColumn("cohort", F.lit("click_only"))
    both = clickers.intersect(buyers).withColumn("cohort", F.lit("click_and_buy"))
    return click_only.unionByName(both)


def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (median + p90) of event value per
    event type — the exact form, not the sketch, so it oracle-checks."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        stable_round(F.percentile("value", 0.5), 4).alias("p50"),
        stable_round(F.percentile("value", 0.9), 4).alias("p90"),
    )


def q_curate(spark, sf_dir):
    """Training-data curation pipeline: exact-dedup -> quality score ->
    per-source token-budget selection (operators/curate.curate_corpus)
    — the flagship composition of the dedup + text-analysis ladder."""
    from qurio_spark.operators.curate import curate_corpus

    return curate_corpus(
        _t(spark, sf_dir, "documents"), per_source_token_budget=800
    )


def q_events_funnel(spark, sf_dir):
    """Sequential funnel: users whose first view precedes their first
    subsequent click precedes their first subsequent purchase — three
    ordered min-timestamp stages, each a groupBy + conditional join
    (the standard funnel shape; shuffles only user-keyed minima)."""
    ev = _events(spark, sf_dir)

    def first_after(event_type, prior, prior_col):
        e = ev.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").alias("_t")
        )
        if prior is None:
            return e.groupBy("user_id").agg(F.min("_t").alias(prior_col))
        return (
            e.join(prior, "user_id")
            .filter(F.col("_t") > F.col(prior.columns[1]))
            .groupBy("user_id")
            .agg(F.min("_t").alias(prior_col))
        )

    views = first_after("view", None, "t_view")
    clicks = first_after("click", views, "t_click")
    buys = first_after("purchase", clicks, "t_buy")
    return (
        views.agg(F.count("*").alias("n"))
        .withColumn("stage", F.lit("view"))
        .unionByName(
            clicks.agg(F.count("*").alias("n")).withColumn("stage", F.lit("click"))
        )
        .unionByName(
            buys.agg(F.count("*").alias("n")).withColumn("stage", F.lit("purchase"))
        )
        .select("stage", "n")
    )


def q_pack_shards(spark, sf_dir):
    """Training-shard packing: distributed-prefix-sum token cumsum ->
    offset-rule shard assignment (operators/sharding.pack_shards over
    operators/prefix, budget 2000; r14 — no per-source single
    reducer)."""
    from qurio_spark.operators.sharding import pack_shards

    return pack_shards(_t(spark, sf_dir, "documents"), token_budget=2000)


def q_sample_mixture(spark, sf_dir):
    """Deterministic domain-mixture sampling: per-source keep
    probabilities decided by a portable md5 draw per doc
    (operators/sharding.sample_mixture)."""
    from qurio_spark.operators.sharding import sample_mixture

    kept = sample_mixture(
        _t(spark, sf_dir, "documents"),
        weights={"src1": 1.0, "src2": 0.5, "src3": 0.25},
        default_weight=0.1,
    )
    return kept.select("doc_id", "source")


def q_revenue_rollup(spark, sf_dir):
    """ROLLUP aggregation (nation, order-year) over the sales join —
    subtotal + grand-total rows in one pass (partial-agg friendly;
    beyond reference scope, training-pipeline reporting shape)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .rollup("n_name", "o_year")
        .agg(stable_round(F.sum(rev), 2).alias("revenue"))
        # subtotal marker NULLs -> sentinels (hash comparators sort row
        # tuples; mixed None/int breaks ordering)
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_year", F.lit(-1)).alias("o_year"),
            "revenue",
        )
    )


def q_events_moving_avg(spark, sf_dir):
    """Frame window: 4-row moving average of event value per user
    (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) — partitioned by user,
    so parallelism scales with user cardinality."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        stable_round(F.avg("value").over(w), 4).alias("mavg"),
    )


def q_first_order_per_customer(spark, sf_dir):
    """Argmin-per-group via row_number window: each customer's earliest
    order with its totalprice (the min-join/correlated-subquery shape)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("first_orderkey"),
            stable_round("o_totalprice", 2).alias("first_totalprice"),
        )
    )




def q_stratified_sample(spark, sf_dir):
    """Exact-n stratified sample (operators/sharding.
    stratified_sample_exact): exactly min(25, |source|) docs per
    source, chosen by portable-hash rank — the deterministic holdout
    sampler (sampleBy is binomial-sized AND plan-dependent; this is
    neither).  Oracle: the same rank in SQL via row_number over the
    md5 expression."""
    from qurio_spark.operators.sharding import stratified_sample_exact

    kept = stratified_sample_exact(
        _t(spark, sf_dir, "documents"), n_per_stratum=25
    )
    return kept.select("doc_id", "source")


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/sharding.weighted_sample, r10 — Efraimidis-Spirakis
    A-ES over the md5-portable hash): top-60 documents by
    u^(1/n_chars) key, i.e. inclusion odds proportional to document
    length.  The oracle reproduces the exact key arithmetic
    (ln(u)/w through stable_round) in SQL."""
    from qurio_spark.operators.sharding import weighted_sample

    kept = weighted_sample(
        _t(spark, sf_dir, "documents"), n=60, weight_col="n_chars"
    )
    return kept.select(
        "doc_id", "n_chars", F.col("_wkey").alias("sk")
    )


def q_data_quality(spark, sf_dir):
    """Deequ-style one-pass data-quality profile of ``orders``
    (operators/quality.dq_profile): completeness, exact distinct
    counts, value bounds, domain-compliance fractions, and key
    uniqueness — every metric a column expression inside ONE global
    aggregation over ONE scan, unpivoted to a long (metric, column,
    value) report with ``stack``.  Fractions are two exact longs
    divided once, so both engines produce bit-identical doubles with
    no rounding."""
    from qurio_spark.operators.quality import dq_profile

    return dq_profile(
        _t(spark, sf_dir, "orders"),
        completeness=["o_custkey", "o_orderstatus"],
        distinctness=["o_orderstatus", "o_orderpriority"],
        bounds=["o_totalprice"],
        compliance={
            "o_orderstatus_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "o_totalprice_positive": F.col("o_totalprice") > 0,
        },
        unique_key="o_orderkey",
    )


def q_export_shards(spark, sf_dir):
    """Training-shard EXPORT sink (operators/sharding.
    export_jsonl_shards): pack documents into ~1000-token shards per
    source, write one JSONL file per shard inside executors
    (mapInPandas — the driver never sees document bytes), and return
    the manifest.  The oracle checks the packing (shard membership,
    doc/token counts — the cumulative-sum window rule); byte/checksum
    determinism is pinned by tests/test_sharding.py.

    NOTE: this entry (like the LM/BPE scoring entries, which train at
    construction) does its heavy work EAGERLY at construction time —
    export_jsonl_shards writes the shards and collects the manifest
    internally; the returned frame is a small driver-local manifest.
    The output directory is created ONCE per process via mkdtemp
    (secure creation — a predictable /tmp name could be pre-created
    by another local user) and its contents wiped on each call, so
    repeated bench/oracle runs reuse it instead of leaking one full
    corpus copy per invocation."""
    import shutil
    import tempfile

    from qurio_spark.operators.sharding import export_jsonl_shards

    global _EXPORT_DIR
    if _EXPORT_DIR is None:
        _EXPORT_DIR = tempfile.mkdtemp(prefix="qurio-shard-export-")
    else:
        shutil.rmtree(_EXPORT_DIR, ignore_errors=True)
        _EXPORT_DIR = tempfile.mkdtemp(prefix="qurio-shard-export-")
    m = export_jsonl_shards(
        _t(spark, sf_dir, "documents"), _EXPORT_DIR, token_budget=1000
    )
    return m.select("shard", "n_docs", "n_tokens")


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-ngram importance weights (operators/dsir.
    dsir_weights — Xie et al. 2023): every document in the raw pool is
    scored by the log-likelihood ratio of its tokens under
    4096-bucket hashed bag-of-token distributions estimated from the
    TARGET domain (sources src0/src1/src2) vs the raw pool — the
    public data-selection recipe for "more documents like these".
    Scores are exact integer milli-nats (ln over integer bucket counts
    only; see the module doc); the bucket tables are bounded at 4096
    rows regardless of corpus size, broadcast into the scoring join,
    and the only corpus-keyed shuffle is the per-doc aggregation.
    Beyond-reference extension (SURVEY §2.8 curation family)."""
    from qurio_spark.operators.dsir import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1", "src2"))
    return dsir_weights(docs, target, n_buckets=4096)


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (operators/sharding.
    pack_sequences): documents laid end-to-end per source and cut into
    fixed 512-token training sequences, long docs spanning consecutive
    sequences (the GPT-style packing convention; pack_shards is the
    whole-doc offset-packing sibling).  Distributed prefix-sum cumsum
    (operators/prefix, r14 — no per-source single reducer) + a bounded
    explode (corpus_tokens/512 + n_docs rows) + one groupBy;
    all-integer arithmetic.  Beyond-reference extension (SURVEY §2.8
    curation & sharding family)."""
    from qurio_spark.operators.sharding import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512)
