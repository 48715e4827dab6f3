"""M8/S2: error taxonomy, retry with exponential backoff, circuit
breaker — the resilience semantics of the reference's ingestion worker,
re-expressed as pure, clock-injectable utilities.

Reference parity:
  - error taxonomy + transient set: ``apps/ingestion-worker/exceptions.py:8-20``
  - queue retry: max 3 attempts, delay 1000ms * 2^n capped 60000ms
    (``apps/ingestion-worker/config.py:17-21``, ``main.py:302-329``)
  - crawl retry: 1 try + 2 retries, backoff 2s * 2^n
    (``handlers/web.py:25-26, :388-398``)
  - LLM-filter circuit breaker: opens after 3 consecutive failures,
    5-minute cooldown (``handlers/web.py:53-84``)

In the Spark rebuild these wrap the *fetch/convert adapters* (the only
places that talk to a network): Spark task retries already cover
executor-level transients, and rows that exhaust their retry budget
flow to the failed-rows quarantine (M5, operators/catalog.py) instead
of poisoning the job.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

# -- error taxonomy (exceptions.py:8-20) ------------------------------------

ERR_ENCRYPTED = "ERR_ENCRYPTED"
ERR_INVALID_FORMAT = "ERR_INVALID_FORMAT"
ERR_EMPTY = "ERR_EMPTY"
ERR_TIMEOUT = "ERR_TIMEOUT"
ERR_CRAWL_TIMEOUT = "ERR_CRAWL_TIMEOUT"
ERR_CRAWL_DNS = "ERR_CRAWL_DNS"
ERR_CRAWL_REFUSED = "ERR_CRAWL_REFUSED"
ERR_CRAWL_BLOCKED = "ERR_CRAWL_BLOCKED"

TRANSIENT_ERRORS = {ERR_TIMEOUT, ERR_CRAWL_TIMEOUT, ERR_CRAWL_DNS, ERR_CRAWL_REFUSED}


class IngestionError(Exception):
    def __init__(self, code: str, message: str = ""):
        self.code = code
        super().__init__(message or code)


def is_transient(error: BaseException | str) -> bool:
    """Retry-eligible?  Unknown/uncoded errors are treated as permanent
    (the reference requeues only coded transients; everything else goes
    to the DLQ)."""
    code = error if isinstance(error, str) else getattr(error, "code", None)
    return code in TRANSIENT_ERRORS


# -- retry policy (config.py:17-21, main.py:302-329) ------------------------


@dataclass(frozen=True)
class RetryPolicy:
    max_attempts: int = 3
    initial_delay_s: float = 1.0
    max_delay_s: float = 60.0
    multiplier: float = 2.0

    def delay_s(self, attempt: int) -> float:
        """Delay before retry ``attempt`` (0-based): initial * m^n, capped."""
        return min(self.initial_delay_s * self.multiplier**attempt, self.max_delay_s)


#: queue-level policy (NSQ requeue semantics)
QUEUE_RETRY = RetryPolicy(3, 1.0, 60.0, 2.0)
#: crawl-level policy (1 try + 2 retries, 2s base; web.py:25-26)
CRAWL_RETRY = RetryPolicy(3, 2.0, 60.0, 2.0)


def with_retries(
    fn,
    policy: RetryPolicy = QUEUE_RETRY,
    sleep=time.sleep,
):
    """Run ``fn()`` with the reference's retry loop: transient errors
    retry with exponential backoff up to max_attempts; permanent errors
    raise immediately (-> M5 quarantine at the caller)."""
    last: BaseException | None = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — taxonomy decides, not type
            if not is_transient(e) or attempt == policy.max_attempts - 1:
                raise
            last = e
            sleep(policy.delay_s(attempt))
    raise last  # pragma: no cover — loop always returns or raises


# -- circuit breaker (web.py:53-84) -----------------------------------------


@dataclass
class CircuitBreaker:
    """Consecutive-failure breaker: after ``threshold`` failures the
    circuit opens for ``cooldown_s``; any success closes it.  The clock
    is injectable so tests (and deterministic pipelines) control time."""

    threshold: int = 3
    cooldown_s: float = 300.0
    clock: Callable[[], float] = time.monotonic
    _consecutive: int = field(default=0, init=False)
    _open_until: float = field(default=0.0, init=False)

    def is_open(self) -> bool:
        return self.clock() < self._open_until

    def record_failure(self) -> None:
        self._consecutive += 1
        if self._consecutive >= self.threshold:
            self._open_until = self.clock() + self.cooldown_s

    def record_success(self) -> None:
        self._consecutive = 0
        self._open_until = 0.0

    def call(self, fn, fallback):
        """``fn()`` guarded by the breaker; when open (or on failure)
        returns ``fallback()`` — the reference bypasses the LLM filter
        and keeps raw markdown rather than failing the page."""
        if self.is_open():
            return fallback()
        try:
            out = fn()
        except Exception:  # noqa: BLE001
            self.record_failure()
            return fallback()
        self.record_success()
        return out


# -- upload validation (S6: source/handler.go:80-167) -----------------------

ALLOWED_UPLOAD_EXTS = {"pdf", "docx", "md", "txt", "json", "csv"}
MAX_UPLOAD_MB = 50  # API default (config.go:41); worker-side cap is 200


def validate_upload(filename: str, size_bytes: int, max_mb: int = MAX_UPLOAD_MB):
    """Extension-whitelist + size check.  Returns the lowercase
    extension; raises IngestionError(ERR_INVALID_FORMAT / ERR_EMPTY)."""
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext not in ALLOWED_UPLOAD_EXTS:
        raise IngestionError(ERR_INVALID_FORMAT, f"extension not allowed: {ext!r}")
    if size_bytes <= 0:
        raise IngestionError(ERR_EMPTY, "empty upload")
    if size_bytes > max_mb * 1024 * 1024:
        raise IngestionError(ERR_INVALID_FORMAT, f"file exceeds {max_mb} MB")
    return ext
