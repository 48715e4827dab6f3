"""JSONL crawl-result source (sources/results.py): the reference's NSQ
payload shape lands as DOCUMENTS_RAW rows with consumer defaults, and
both the batch and streaming readers drive the chunk pipeline.
"""

import json

import pytest
from pyspark.sql import functions as F

from qurio_spark.sources.results import read_result_jsonl, stream_result_jsonl

PAYLOADS = [
    {
        "source_id": "s1", "url": "https://d.com/a", "title": "A", "path": "docs",
        "content": "# A\n\nEnough prose content to survive the noise filters easily.",
        "links": ["https://d.com/b"], "depth": 0, "status": "success",
        "metadata": {"author": "ada", "created_at": "2024-01-01", "pages": 3,
                     "language": "en"},
        "correlation_id": "ignored-queue-plumbing",
    },
    # omitted status/links/depth/metadata -> defaults (status success)
    {
        "source_id": "s1", "url": "https://d.com/b", "title": "B", "path": "docs",
        "content": "# B\n\nAnother page with plenty of content for the chunker here.",
    },
    {
        "source_id": "s1", "url": "https://d.com/broken", "content": "",
        "status": "failed", "error": "ERR_CRAWL_TIMEOUT", "depth": 1,
    },
]


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("results")
    (d / "batch1.jsonl").write_text("\n".join(json.dumps(p) for p in PAYLOADS))
    return str(d)


class TestResultJsonl:
    def test_shape_and_defaults(self, spark, jsonl_dir):
        rows = {r["url"]: r for r in read_result_jsonl(spark, jsonl_dir).collect()}
        assert set(rows) == {"https://d.com/a", "https://d.com/b", "https://d.com/broken"}
        a = rows["https://d.com/a"]
        assert a["links"] == ["https://d.com/b"] and a["metadata"]["author"] == "ada"
        b = rows["https://d.com/b"]
        assert b["status"] == "success"  # omitted -> success (consumer default)
        assert b["links"] == [] and b["depth"] == 0 and b["metadata"] is None
        broken = rows["https://d.com/broken"]
        assert broken["status"] == "failed" and broken["error"] == "ERR_CRAWL_TIMEOUT"

    def test_feeds_chunk_pipeline(self, spark, jsonl_dir):
        from qurio_spark.plans.pipeline import build_chunks

        chunks = build_chunks(read_result_jsonl(spark, jsonl_dir))
        urls = {r["url"] for r in chunks.select("url").distinct().collect()}
        assert urls == {"https://d.com/a", "https://d.com/b"}  # failed row skipped

    def test_streaming_twin_matches_batch(self, spark, jsonl_dir, tmp_path):
        out = str(tmp_path / "out")
        q = (
            stream_result_jsonl(spark, jsonl_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(tuple(r) for r in read_result_jsonl(spark, jsonl_dir).collect())
        assert got == want
