"""Committed full-coverage gate over EVERY ``queries()`` entry.

Round-4 lesson: the driver's CORRECTNESS file checks only the first 50
``queries()`` entries, so an out-of-window regression (streaming_hourly)
shipped with no committed signal.  This module closes that gap two ways:

1. ``test_query_analyzes`` — builds every entry's DataFrame at sf0.001
   and touches ``.schema``: any AnalysisException (the failure class of
   both round-4 regressions) fails in seconds without executing a job.
2. ``test_query_oracle`` — full Spark-vs-DuckDB value compare for every
   oracle-backed entry at sf0.001 (same rules as the driver gate, shared
   via qurio_spark.oracle).
3. The four rows-only entries get real checks, not row counts:
   golden row-hashes (chunker, ingest pipeline), recall vs the dense
   oracle (pruned IVF hybrid), and codebook invariants (k-means).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

import __spark_entry__ as entrymod
from qurio_spark.oracle import compare, register_views

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ORACLE_BACKED = [n for n in QUERIES if n in ORACLES]
ROWS_ONLY = [n for n in QUERIES if n not in ORACLES]

# Entries that execute real Structured Streaming runs when called —
# exercised by the oracle test below, excluded from the build-only
# analysis smoke (constructing them IS executing them).
STREAMING = {"streaming_ingest", "streaming_hourly", "streaming_join"}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    register_views(con, sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in STREAMING])
def test_query_analyzes(spark, sf_dir, name):
    """Every entry must at least build and resolve its plan."""
    df = QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_oracle(spark, sf_dir, duck, name):
    from qurio_spark.operators.cachectl import release_caches

    sdf = QUERIES[name](spark, sf_dir)
    scols, srows = sdf.columns, sdf.collect()
    release_caches(sdf)  # the 144-entry sweep must not accumulate caches
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    problems = compare(scols, srows, dcols, res.fetchall())
    assert not problems, f"{name}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# Rows-only entries promoted to real checks (VERDICT r4 item 5)
# ---------------------------------------------------------------------------


# Golden sha256 hashes of the order-normalized result rows now live in
# qurio_spark/goldens.py (pinned per SF, shared with
# tools/oracle_check.py so the committed sweeps verify the rows-only
# tail too).  All five rows-only pipelines are deterministic, so any
# drift is a real behavior change (or a driver testdata regen — in
# which case re-pin from the assert message).
from qurio_spark.goldens import GOLDEN_ROW_HASHES, golden_for, row_hash


@pytest.mark.parametrize("name", sorted(GOLDEN_ROW_HASHES))
def test_rows_only_golden_hash(spark, sf_dir, name):
    want = golden_for(name, sf_dir)
    assert want is not None, f"no golden pinned for {name} at {sf_dir}"
    got = row_hash(QUERIES[name](spark, sf_dir))
    assert got == want, f"{name} golden row-hash drifted: {got}"


def test_every_rows_only_entry_has_a_golden():
    assert set(GOLDEN_ROW_HASHES) == set(ROWS_ONLY), (
        sorted(set(ROWS_ONLY) ^ set(GOLDEN_ROW_HASHES))
    )


def test_ivf_pruned_recall(spark, sf_dir):
    """Pruned-normalization IVF hybrid (now the batch_hybrid_ivf
    default) must keep >=0.95 recall vs the dense oracle (bench extras
    report 1.0 at sf0.1; the doc-set oracle additionally pins exact
    set equality — this test keeps the recall metric explicit)."""
    from qurio_spark.operators.cachectl import release_caches

    ddf = QUERIES["batch_hybrid"](spark, sf_dir)
    pdf = QUERIES["batch_hybrid_ivf"](spark, sf_dir)
    dense, pruned = ddf.collect(), pdf.collect()
    release_caches(ddf)
    release_caches(pdf)
    d, p = defaultdict(set), defaultdict(set)
    for r in dense:
        d[r["query_id"]].add(r["doc_id"])
    for r in pruned:
        p[r["query_id"]].add(r["doc_id"])
    assert d, "dense oracle returned no rows"
    recalls = {q: len(d[q] & p[q]) / len(d[q]) for q in d}
    assert min(recalls.values()) >= 0.95, f"recall fell: {recalls}"


def test_epoch_secs_is_timezone_free(spark):
    """_epoch_secs on TIMESTAMP_NTZ must return as-if-UTC floor epochs
    under ANY session timezone — including wall-clocks inside a DST
    gap, where every NTZ->LTZ coercion path (cast, date_trunc,
    timestamp_diff) shifts the value by an hour.  The driver probes
    stock sessions whose timezone is the machine's, so this is a real
    correctness boundary, not a theoretical one."""
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.createDataFrame(
            [("2024-03-10 02:30:00.5",),   # inside the spring-forward gap
             ("2024-11-03 01:30:00.1",),   # fall-back ambiguous hour
             ("1996-06-01 12:00:00.999999",)],
            "s string",
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        got = sorted(
            r["es"] for r in df.select(entrymod._epoch_secs(df).alias("es")).collect()
        )
        assert got == sorted([1710037800, 1730597400, 833630400])
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_bpe_tokenize_matches_driver_reference(spark, sf_dir):
    """The UDF's counts must equal a driver-side re-encode with the
    SAME trained merges (catches closure/broadcast drift), and the
    training must be run-to-run deterministic.  The BPE algorithm
    itself is golden-pinned in tests/test_bpe.py."""
    from qurio_spark.functions.bpe import BpeTokenizer, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=100, max_words=5000)
    assert merges == train_bpe(docs, n_merges=100, max_words=5000)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in QUERIES["bpe_tokenize"](spark, sf_dir).collect()
    }
    tok = BpeTokenizer(merges)
    sample = docs.orderBy("doc_id").limit(20).collect()
    for r in sample:
        assert got[r["doc_id"]] == len(tok.encode_text(r["text"]))
    assert len(got) == docs.count()


def test_kmeans_ivf_codebook(spark, sf_dir):
    """Fixed-seed k-means labeling: every vector labeled exactly once,
    all k=8 clusters populated, and no degenerate mega-cluster."""
    rows = QUERIES["kmeans_ivf"](spark, sf_dir).collect()
    labels = {r["label"]: r["n_vecs"] for r in rows}
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sorted(labels) == list(range(8))
    assert sum(labels.values()) == total
    assert max(labels.values()) <= total // 2, f"degenerate cluster: {labels}"


def test_semantic_dedup_summary(spark, sf_dir):
    """Fixed-seed SemDeDup survivor set: pinned as a COMMITTED GOLDEN
    (sha256 of the full sorted survivor id list at sf0.001) — the
    pipeline is md5-seeded deterministic, so any survivor swap, keep-
    rule regression, or clustering drift changes the hash (the old
    (count, id_sum) summary could collide on swaps; VERDICT r11).  The
    keep rule itself is pinned against a numpy recomputation in
    tests/test_dedup.py::TestSemanticDedup."""
    a = QUERIES["semantic_dedup"](spark, sf_dir).first()
    b = QUERIES["semantic_dedup"](spark, sf_dir).first()
    assert (a["n_survivors"], a["survivor_sha"]) == (
        b["n_survivors"], b["survivor_sha"],
    )
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert 0 < a["n_survivors"] < total  # real dedup, not a no-op
    assert (a["n_survivors"], a["survivor_sha"]) == (
        203,
        "7fecdaf718e5d3a2c67adc3ad550b15031c45baef57fd0c9952cad79f0500b2e",
    )


def test_driver_window_is_fully_oracle_backed():
    """Tripwire for the window-rotation contract: the driver's
    correctness gate reads the FIRST 50 queries() entries, so every one
    of them must carry an oracle_sql twin — a rotation that pushes an
    oracle-backed entry out in favor of a rows-only one (or registers a
    new in-window query without its oracle) fails here, not in the
    round's CORRECTNESS report."""
    import __spark_entry__ as entrymod

    window = list(entrymod.queries())[:50]
    oracles = set(entrymod.oracle_sql())
    assert not [n for n in window if n not in oracles]
