"""Full-system slice: distributed crawl -> chunk+embed ingest ->
search (keyword + hybrid + rerank) -> page reconstruction -> janitor
views, then an incremental re-crawl with body-hash skip.  Every stage
is the production path; this is the 'a reference user could switch'
composition test.
"""

import pytest
from pyspark.sql import functions as F

from qurio_spark.api import Engine
from qurio_spark.operators.crawl import run_crawl_distributed, source_completion
from qurio_spark.plans.pipeline import (
    apply_incremental,
    build_chunks,
    split_unchanged,
)

SITE_V1 = {
    "https://docs.d.com/": (
        "# Welcome\n\nThe documentation index for the engine and its setup guides.",
        ["https://docs.d.com/install", "https://docs.d.com/search"],
    ),
    "https://docs.d.com/install": (
        "# Install guide\n\nDownload the release binary and place it on your PATH "
        "before the first start.\n\n```bash\ncurl -fsSL https://docs.d.com/i.sh | sh\n```",
        [],
    ),
    "https://docs.d.com/search": (
        "# Search\n\nHybrid retrieval fuses keyword scores with vector similarity "
        "for ranked results across the indexed corpus.",
        [],
    ),
}


def fetch_v1(task):
    content, links = SITE_V1[task["url"]]
    return {"content": content, "links": links, "title": task["url"]}


def _docs_raw(docs):
    return docs.withColumn(
        "metadata",
        F.lit(None).cast(
            "struct<author:string,created_at:string,pages:int,language:string>"
        ),
    )


class TestFullSystem:
    @pytest.fixture(scope="class")
    def crawled(self, spark):
        seeds = spark.createDataFrame(
            [("src", "https://docs.d.com/")], "source_id string, url string"
        )
        return run_crawl_distributed(spark, seeds, fetch_v1, max_depth=1)

    @pytest.fixture(scope="class")
    def chunks(self, spark, crawled, tmp_path_factory):
        from qurio_spark.plans.pipeline import ingest

        _pages, docs = crawled
        path = str(tmp_path_factory.mktemp("e2e") / "chunks")
        return ingest(spark, _docs_raw(docs), path, source_names={"src": "Docs"})

    def test_crawl_covers_site_and_completes(self, crawled):
        pages, docs = crawled
        assert {r["url"] for r in pages.collect()} == set(SITE_V1)
        assert all(r["status"] == "completed" for r in pages.collect())
        comp = source_completion(pages).collect()
        assert comp == [type(comp[0])(source_id="src", status="completed")]

    def test_search_and_read_page(self, chunks):
        eng = Engine(chunks=chunks)
        rows = eng.search("hybrid keyword vector ranking", alpha=0.5, limit=3)
        assert rows and rows[0]["url"] == "https://docs.d.com/search"
        # MCP read_page reconstructs the full page from its chunks
        resp = eng.process_request({
            "jsonrpc": "2.0", "id": 1, "method": "tools/call",
            "params": {"name": "qurio_read_page",
                       "arguments": {"url": "https://docs.d.com/install"}},
        })
        text = resp["result"]["content"][0]["text"]
        assert "Install guide" in text and "curl -fsSL" in text

    def test_incremental_recrawl_skips_unchanged(self, spark, crawled, chunks):
        _pages, docs_v1 = crawled

        # v2: only /search changed
        def fetch_v2(task):
            r = fetch_v1(task)
            if task["url"] == "https://docs.d.com/search":
                r = {**r, "content": r["content"] + "\n\nNew paragraph about reranking quality."}
            return r

        seeds = spark.createDataFrame(
            [("src", "https://docs.d.com/")], "source_id string, url string"
        )
        _p2, docs_v2 = run_crawl_distributed(spark, seeds, fetch_v2, max_depth=1)
        prior = _docs_raw(docs_v1).select(
            "url", F.sha2("content", 256).alias("body_hash")
        )
        changed, unchanged = split_unchanged(_docs_raw(docs_v2), prior)
        assert [r["url"] for r in changed.collect()] == ["https://docs.d.com/search"]
        assert unchanged.count() == 2

        merged = apply_incremental(
            chunks, build_chunks(changed.drop("body_hash"), source_names={"src": "Docs"}),
            changed.select("url"),
        )
        new_rows = merged.filter(F.col("url") == "https://docs.d.com/search").collect()
        assert any("New paragraph about reranking" in r["content"] for r in new_rows)
        # untouched page rows identical
        old = sorted(r["content"] for r in chunks.filter(F.col("url") == "https://docs.d.com/install").collect())
        new = sorted(r["content"] for r in merged.filter(F.col("url") == "https://docs.d.com/install").collect())
        assert old == new


class TestPdfUploadRoundTrip:
    """S5 end-to-end: a generated text PDF flows through convert ->
    docs_raw -> chunk+embed -> hybrid search and is retrievable by its
    own body text (VERDICT r2 #5; reference bar handlers/file.py:196-299)."""

    def test_pdf_convert_chunk_search(self, spark, tmp_path):
        from qurio_spark.operators.hybrid import hybrid_search
        from qurio_spark.sources.multimodal import (
            convert_files,
            read_binary_dir,
            uploads_to_docs_raw,
        )
        from tests.pdf_fixture import make_pdf

        d = tmp_path / "uploads"
        d.mkdir()
        (d / "quarterly.pdf").write_bytes(
            make_pdf(
                [
                    ["Quarterly revenue grew twelve percent.",
                     "Cloud segment led the expansion."],
                    ["Outlook remains cautiously optimistic."],
                ],
                title="Q3 Summary",
                compress=True,
            )
        )
        (d / "scanned.pdf").write_bytes(
            make_pdf([["x"]], image_only=True)
        )
        (d / "readme.md").write_text("# Other upload\n\nUnrelated body.")

        converted = convert_files(read_binary_dir(spark, str(d)))
        docs_raw = uploads_to_docs_raw(converted, source_id="up1")
        chunks = build_chunks(docs_raw)

        rows = chunks.collect()
        pdf_rows = [r for r in rows if r["url"].endswith("quarterly.pdf")]
        assert pdf_rows, "text PDF must produce chunks"
        assert all(r["title"] == "Q3 Summary" for r in pdf_rows)
        assert all(r["page_count"] == 2 for r in pdf_rows)
        assert not any(r["url"].endswith("scanned.pdf") for r in rows)

        corpus = chunks.withColumnRenamed("content", "text").withColumn(
            "doc_id", F.monotonically_increasing_id()
        )
        from qurio_spark.functions.embedder import embed_text_py

        top = hybrid_search(
            corpus,
            "quarterly revenue grew",
            embed_text_py("quarterly revenue grew"),
            alpha=0.5,
            limit=3,
            extra_cols=["url"],
        ).collect()
        assert top and top[0]["url"].endswith("quarterly.pdf")

    def test_scanned_pdf_quarantined_with_retryable_payload(self, spark, tmp_path):
        """The scanned-PDF path a real user hits: an image-only PDF (no
        text operators, no OCR in this environment) must flow
        convert_files -> docs_raw -> M5 quarantine as a coded DLQ row
        whose payload re-materializes the original task — not vanish
        silently (reference bar handlers/file.py:196-299, where docling
        would OCR it)."""
        from qurio_spark.operators.catalog import (
            quarantine_failures,
            retry_payloads,
        )
        from qurio_spark.sources.multimodal import (
            ERR_CONVERSION_STUBBED,
            convert_files,
            read_binary_dir,
            uploads_to_docs_raw,
        )
        from tests.pdf_fixture import make_pdf

        d = tmp_path / "uploads"
        d.mkdir()
        (d / "scan.pdf").write_bytes(make_pdf([["x"]], image_only=True))
        (d / "ok.md").write_text("# Fine\n\nDigital body.")

        docs_raw = uploads_to_docs_raw(
            convert_files(read_binary_dir(spark, str(d))), source_id="up1"
        )
        dlq = quarantine_failures(spark, docs_raw).collect()
        assert len(dlq) == 1
        row = dlq[0]
        assert row["error"] == ERR_CONVERSION_STUBBED
        assert row["handler"] == "ingestion-worker"
        assert row["source_id"] == "up1"
        # payload round-trips to a retryable task pointing at the file
        (payload,) = retry_payloads(
            quarantine_failures(spark, docs_raw)
        )
        assert payload["url"].endswith("scan.pdf")
        assert payload["source_id"] == "up1"
        # the good upload is NOT quarantined
        ok = docs_raw.filter("status = 'success'").collect()
        assert len(ok) == 1 and ok[0]["url"].endswith("ok.md")


class TestTrainingDataPipeline:
    """The canonical training-corpus composition of this engine's
    operator families end to end on real testdata: near-dup candidate
    removal -> benchmark decontamination -> quality/budget curation ->
    shard packing.  Asserts the row-flow invariants each stage
    guarantees, not goldens — the per-stage numerics are already
    oracle-checked query by query."""

    def test_full_composition(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from qurio_spark.operators.curate import curate_corpus
        from qurio_spark.operators.dedup import (
            contamination_flags,
            minhash_lsh_pairs,
        )
        from qurio_spark.operators.sharding import pack_shards

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n0 = docs.count()

        # 1. near-dup removal: drop the higher id of every LSH pair
        pairs = minhash_lsh_pairs(docs, num_perm=4, bands=2)
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        deduped = docs.join(losers, "doc_id", "left_anti")
        n1 = deduped.count()
        assert 0 < n1 < n0  # the corpus HAS near-dups; some survive

        # 2. decontamination vs the held-out eval slice
        bench = deduped.filter(F.col("doc_id") % 100 == 7)
        train = deduped.filter(F.col("doc_id") % 100 != 7)
        flagged = contamination_flags(train, bench, n=4)
        clean = train.join(flagged.select("doc_id"), "doc_id", "left_anti")
        n2 = clean.count()
        assert n2 <= n1

        # 3. curation: per-source quality selection under token budget
        kept = curate_corpus(clean, per_source_token_budget=2000)
        budgets = kept.groupBy("source").agg(F.max("cum_tokens").alias("t"))
        assert budgets.filter(F.col("t") > 2000).count() == 0
        assert kept.count() > 0

        # 4. shard packing over the curated set
        curated_docs = clean.join(kept.select("doc_id"), "doc_id")
        shards = pack_shards(curated_docs, token_budget=1000)
        per_shard = shards.groupBy("source", "shard_id").agg(
            F.sum("n_tokens").alias("t"), F.count("*").alias("n")
        )
        # offset-packing: a shard only exceeds budget via its LAST doc
        # (a doc's START offset is in-window), so tokens < budget +
        # that shard's largest doc
        mx = shards.groupBy("source", "shard_id").agg(
            F.max("n_tokens").alias("mx")
        )
        bad = (
            per_shard.join(mx, ["source", "shard_id"])
            .filter(F.col("t") >= 1000 + F.col("mx"))
            .count()
        )
        assert bad == 0
        # every curated doc landed in exactly one shard
        assert shards.count() == curated_docs.count()
