"""M8/S2/S6 resilience semantics (mirrors reference
tests/test_worker_retry.py + web handler breaker tests + upload
validation in source/handler.go)."""

import pytest

from qurio_spark.functions.resilience import (
    CRAWL_RETRY,
    ERR_CRAWL_DNS,
    ERR_INVALID_FORMAT,
    QUEUE_RETRY,
    CircuitBreaker,
    IngestionError,
    RetryPolicy,
    is_transient,
    validate_upload,
    with_retries,
)


class TestTaxonomy:
    def test_transient_codes(self):
        assert is_transient(IngestionError("ERR_TIMEOUT"))
        assert is_transient(IngestionError(ERR_CRAWL_DNS))
        assert is_transient("ERR_CRAWL_REFUSED")

    def test_permanent_codes(self):
        assert not is_transient(IngestionError(ERR_INVALID_FORMAT))
        assert not is_transient(IngestionError("ERR_ENCRYPTED"))
        assert not is_transient(ValueError("uncoded"))  # unknown -> permanent


class TestBackoff:
    def test_queue_schedule_caps_at_60s(self):
        # 1s * 2^n capped 60s (config.py:17-21)
        assert [QUEUE_RETRY.delay_s(n) for n in range(7)] == [
            1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 60.0,
        ]

    def test_crawl_schedule(self):
        # 2s * 2^n (web.py:25-26)
        assert [CRAWL_RETRY.delay_s(n) for n in range(3)] == [2.0, 4.0, 8.0]


class TestWithRetries:
    def test_transient_retries_then_succeeds(self):
        calls, sleeps = [], []
        def fn():
            calls.append(1)
            if len(calls) < 3:
                raise IngestionError("ERR_TIMEOUT")
            return "ok"
        assert with_retries(fn, QUEUE_RETRY, sleep=sleeps.append) == "ok"
        assert len(calls) == 3
        assert sleeps == [1.0, 2.0]

    def test_transient_exhausts_budget(self):
        calls = []
        def fn():
            calls.append(1)
            raise IngestionError("ERR_TIMEOUT", "still down")
        with pytest.raises(IngestionError):
            with_retries(fn, RetryPolicy(max_attempts=3), sleep=lambda s: None)
        assert len(calls) == 3  # max 3 attempts, no more

    def test_permanent_fails_fast(self):
        calls = []
        def fn():
            calls.append(1)
            raise IngestionError(ERR_INVALID_FORMAT)
        with pytest.raises(IngestionError):
            with_retries(fn, QUEUE_RETRY, sleep=lambda s: None)
        assert len(calls) == 1  # no retry -> DLQ at caller


class TestCircuitBreaker:
    def test_opens_after_threshold_and_cools_down(self):
        now = [0.0]
        br = CircuitBreaker(threshold=3, cooldown_s=300.0, clock=lambda: now[0])
        boom = lambda: (_ for _ in ()).throw(RuntimeError("llm down"))
        for _ in range(3):
            assert br.call(boom, lambda: "raw") == "raw"
        assert br.is_open()
        # while open, fn is never invoked
        assert br.call(lambda: "filtered", lambda: "raw") == "raw"
        now[0] = 301.0  # past cooldown
        assert not br.is_open()
        assert br.call(lambda: "filtered", lambda: "raw") == "filtered"

    def test_success_resets_consecutive_count(self):
        br = CircuitBreaker(threshold=3, clock=lambda: 0.0)
        br.record_failure(); br.record_failure()
        br.record_success()
        br.record_failure(); br.record_failure()
        assert not br.is_open()  # never hit 3 consecutive


class TestUploadValidation:
    def test_whitelist(self):
        assert validate_upload("doc.PDF", 100) == "pdf"
        assert validate_upload("notes.md", 1) == "md"
        for bad in ("run.exe", "archive.tar.gz", "noext"):
            with pytest.raises(IngestionError):
                validate_upload(bad, 100)

    def test_size_limits(self):
        with pytest.raises(IngestionError):
            validate_upload("a.pdf", 0)
        with pytest.raises(IngestionError):
            validate_upload("a.pdf", 51 * 1024 * 1024)
        assert validate_upload("a.pdf", 200 * 1024 * 1024, max_mb=200) == "pdf"
