"""Remote provider adapters (the engine's only network seams besides
crawl fetch): a Gemini-shaped batch HTTP embedder and a
Jina/Cohere-shaped reranker client.

Reference parity:
  - embedder: ``internal/adapter/gemini/dynamic_embedder.go:30-56`` —
    provider behind an interface, 60 s timeout, API key resolved
    per-request from settings (hot-swap, no restart).
  - reranker: ``internal/adapter/reranker/client.go:31-160`` — POST
    query+documents, reorder by returned (index, relevance_score)
    pairs; Jina and Cohere share the payload shape modulo field names.
  - tests run against a canned local HTTP server, mirroring the
    reference's httptest pattern (``adapter/weaviate/store_test.go:92-223``).

Design rules:
  - the embedder UDF is Arrow-batched and issues ONE HTTP call per
    ``max_batch`` texts — never per row; executors each hold their own
    connection (no driver fan-in).
  - failures map onto the M8 taxonomy: timeouts/refused are transient
    (retried with backoff inside the worker), HTTP 4xx and shape
    mismatches are permanent (raise -> quarantine at the caller).
  - the deterministic HashingEmbedder stays the default everywhere;
    nothing in the engine requires the network.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

from qurio_spark.functions.resilience import (
    ERR_CRAWL_REFUSED,
    ERR_TIMEOUT,
    IngestionError,
    RetryPolicy,
    with_retries,
)

#: dynamic_embedder.go:36 — the provider call times out at 60 s.
DEFAULT_TIMEOUT_S = 60.0
#: permanent-error codes (not in TRANSIENT_ERRORS -> no retry)
ERR_PROVIDER_HTTP = "ERR_PROVIDER_HTTP"
ERR_PROVIDER_SHAPE = "ERR_PROVIDER_SHAPE"


def _post_json(
    url: str,
    payload: dict,
    headers: dict[str, str],
    timeout_s: float,
) -> dict:
    """POST JSON -> parsed JSON with taxonomy-coded failures: network
    timeouts and refused connections raise TRANSIENT codes (retryable),
    HTTP status errors raise permanent ones."""
    import socket
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        # 429/5xx are retryable at the provider level; the reference
        # requeues coded transients only, so map them to ERR_TIMEOUT's
        # transient family vs permanent 4xx
        if e.code == 429 or e.code >= 500:
            raise IngestionError(ERR_TIMEOUT, f"HTTP {e.code} from {url}") from e
        raise IngestionError(ERR_PROVIDER_HTTP, f"HTTP {e.code} from {url}") from e
    except socket.timeout as e:
        raise IngestionError(ERR_TIMEOUT, f"timeout after {timeout_s}s") from e
    except urllib.error.URLError as e:
        reason = getattr(e, "reason", None)
        if isinstance(reason, socket.timeout):
            raise IngestionError(ERR_TIMEOUT, f"timeout after {timeout_s}s") from e
        raise IngestionError(ERR_CRAWL_REFUSED, str(reason)) from e
    except (ValueError, json.JSONDecodeError) as e:
        raise IngestionError(ERR_PROVIDER_SHAPE, f"bad JSON from {url}") from e


_WORKER_PROVIDER_CACHE: dict = {}


def _config_fingerprint(v, depth: int = 0):
    """A hashable, deep fingerprint of a provider's FULL config, stable
    across pickled copies of the same instance: scalars verbatim,
    containers element-wise, callables by their code object's
    (file, line, bytecode) — stable under cloudpickle round-trips while
    distinct for different functions/lambdas — and nested objects
    (RetryPolicy, an injected breaker) by type + their own vars()."""
    if isinstance(v, (str, int, float, bool, bytes, type(None))):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_config_fingerprint(x, depth + 1) for x in v)
    if isinstance(v, (dict,)):
        return tuple(
            sorted(
                (str(k), _config_fingerprint(x, depth + 1))
                for k, x in v.items()
            )
        )
    if callable(v) and hasattr(v, "__code__"):
        c = v.__code__
        return ("fn", c.co_filename, c.co_firstlineno, c.co_code)
    if depth < 3 and hasattr(v, "__dict__"):
        return (
            type(v).__module__,
            type(v).__qualname__,
            _config_fingerprint(vars(v), depth + 1),
        )
    return (type(v).__module__, type(v).__qualname__)


def worker_shared(provider):
    """Per-worker-process provider singleton.  Closures ship a PICKLED
    COPY of a provider into every Spark task, so instance state — the
    circuit breaker above all — resets per task: the 3-failure/5-minute
    open window can never accumulate across tasks, and each task
    re-pays the doomed calls during an outage.  The reference's breaker
    is a per-worker-process GLOBAL (web.py:54-57); this is the
    distributed analogue: the first copy deserialized in this worker
    process is cached by the provider's config identity and every later
    task in the same worker reuses it, so breaker state genuinely
    spans tasks.  Call it INSIDE the executed function (mapInPandas
    body / UDF), never at closure-capture time on the driver.

    Identity is the provider's FULL config (every constructor-set
    field, via ``_config_fingerprint``), not a hand-picked subset:
    two providers sharing endpoint+model but differing in
    ``key_provider``/``timeout_s``/retry policy/injected breaker must
    NOT collapse to whichever copy a worker saw first (ADVICE r11 —
    that silently used the wrong credentials for later tasks).  A
    provider may pin its own identity by exposing ``cache_key``."""
    explicit = getattr(provider, "cache_key", None)
    key = (
        type(provider).__module__,
        type(provider).__qualname__,
        explicit
        if explicit is not None
        else _config_fingerprint(vars(provider)),
    )
    return _WORKER_PROVIDER_CACHE.setdefault(key, provider)


class HttpEmbedder:
    """Gemini-shaped batch embedding provider (dynamic_embedder.go:30-56).

    Request:  ``{"model": m, "texts": [...]}`` with the API key header
    resolved per call from ``key_provider`` (the hot-swap semantics —
    settings changes take effect on the next batch, no restart).
    Response: ``{"embeddings": [[...], ...]}``, one vector per text,
    validated for count and dimension.
    """

    def __init__(
        self,
        endpoint: str,
        model: str = "gemini-embedding-001",
        dim: int = 64,
        key_provider: Callable[[], str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        policy: RetryPolicy | None = None,
        max_batch: int = 256,
    ):
        self.endpoint = endpoint
        self.model = model
        self.dim = dim
        self.key_provider = key_provider or (lambda: "")
        self.timeout_s = timeout_s
        self.policy = policy or RetryPolicy()
        self.max_batch = max_batch

    def _headers(self) -> dict[str, str]:
        key = self.key_provider()
        return {"x-goog-api-key": key} if key else {}

    def _call(self, texts: list[str]) -> list[list[float]]:
        body = _post_json(
            self.endpoint,
            {"model": self.model, "texts": texts},
            self._headers(),
            self.timeout_s,
        )
        embs = body.get("embeddings")
        if not isinstance(embs, list) or len(embs) != len(texts):
            raise IngestionError(
                ERR_PROVIDER_SHAPE,
                f"expected {len(texts)} embeddings, got "
                f"{len(embs) if isinstance(embs, list) else type(embs).__name__}",
            )
        for v in embs:
            if not isinstance(v, list) or len(v) != self.dim:
                raise IngestionError(
                    ERR_PROVIDER_SHAPE, f"expected dim {self.dim} vectors"
                )
        return embs

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        """Chunked + retried batch embed (usable driver- or worker-side)."""
        out: list[list[float]] = []
        for i in range(0, len(texts), self.max_batch):
            chunk = [t or "" for t in texts[i : i + self.max_batch]]
            out.extend(with_retries(lambda c=chunk: self._call(c), self.policy))
        return out

    def embed_query(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]

    def udf(self):
        """Arrow-batched pandas UDF: one HTTP call per ``max_batch``
        texts, retry/backoff inside the worker.  Same signature as
        HashingEmbedder.udf(), so it drops into plans/pipeline
        unchanged."""
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        provider = self

        # real (non-string) annotations: the module-wide `from
        # __future__ import annotations` would stringify them and break
        # pandas_udf type-hint inference (same note as
        # similarity.assign_labels)
        def _embed(texts):
            import numpy as np

            vecs = provider.embed_batch(texts.tolist())
            return pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

        _embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return F.pandas_udf(T.ArrayType(T.FloatType()))(_embed)


#: The extraction brief sent with every content-filter call — same
#: contract as the reference's LLM filter instruction
#: (handlers/web.py:29-51): keep the technical substance of a docs
#: page, drop the chrome.
CONTENT_FILTER_INSTRUCTION = (
    "Extract the technical content from this software documentation "
    "page.\n"
    "Keep: code examples and their comments, function and method "
    "signatures, configuration syntax, technical explanations, error "
    "messages and troubleshooting steps, links to related API docs.\n"
    "Remove: navigation menus and sidebars, copyright and legal "
    "notices, unrelated marketing, edit-this-page links, cookie "
    "banners.\n"
    "Preserve: code-block language annotations, heading hierarchy, "
    "inline code references, numbered step lists."
)


class HttpContentFilter:
    """Gemini-flash-shaped LLM content filter — the S2 boilerplate
    strip (handlers/web.py:28-84, 244-276: ``LLMContentFilter`` over
    gemini-flash with a 3-failure/5-minute circuit breaker).

    Request:  ``{"model": m, "instruction": ..., "documents": [md,
    ...]}`` with ``Authorization: Bearer <key>`` resolved per call
    (hot-swap).  Response: ``{"results": [{"text": "..."}, ...]}`` —
    one result per document, count-validated.

    :meth:`filter_batch` returns one entry per input: the filtered
    markdown, or ``None`` when the caller must KEEP its deterministic
    markdown — breaker open (bypass), terminal provider failure, or an
    empty filter result (the reference treats empty ``fit_markdown``
    as a filter failure and falls back to raw markdown,
    web.py:196-203, 292-296).  A provider failure therefore never
    fails a page — the deterministic ``html_to_markdown`` +
    ``clean_markdown_noise`` path is always the floor.

    The breaker lives on the instance; executor-side call sites route
    through :func:`worker_shared` so one copy per Python worker
    process carries the breaker across tasks — the distributed
    analogue of the reference's per-worker-process globals
    (web.py:54-57).  A bare instance captured in a task closure would
    deserialize fresh per task and the open window would never
    accumulate."""

    def __init__(
        self,
        endpoint: str,
        model: str = "gemini-flash",
        instruction: str | None = None,
        key_provider: Callable[[], str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        policy: RetryPolicy | None = None,
        max_batch: int = 8,
        breaker=None,
    ):
        from qurio_spark.functions.resilience import CircuitBreaker

        self.endpoint = endpoint
        self.model = model
        self.instruction = instruction or CONTENT_FILTER_INSTRUCTION
        self.key_provider = key_provider or (lambda: "")
        self.timeout_s = timeout_s
        self.policy = policy or RetryPolicy()
        self.max_batch = max_batch
        # web.py:58-59 — 3 consecutive failures open it for 5 min
        self.breaker = breaker if breaker is not None else CircuitBreaker()

    def _call(self, texts: list[str]) -> list[dict]:
        key = self.key_provider()
        headers = {"Authorization": f"Bearer {key}"} if key else {}
        body = _post_json(
            self.endpoint,
            {
                "model": self.model,
                "instruction": self.instruction,
                "documents": list(texts),
            },
            headers,
            self.timeout_s,
        )
        results = body.get("results")
        if not isinstance(results, list) or len(results) != len(texts):
            raise IngestionError(
                ERR_PROVIDER_SHAPE,
                f"expected {len(texts)} filter results, got "
                f"{len(results) if isinstance(results, list) else type(results).__name__}",
            )
        return results

    def filter_batch(self, texts: Sequence[str]) -> list:
        """One entry per input text: filtered markdown, or ``None`` =
        keep the deterministic markdown.  Chunked one HTTP call per
        ``max_batch`` documents; each chunk is breaker-gated and
        caught independently, so a mid-batch outage bypasses only the
        remaining chunks (same posture as the OCR provider)."""
        out: list = []
        for i in range(0, len(texts), self.max_batch):
            chunk = [t or "" for t in texts[i : i + self.max_batch]]
            if self.breaker.is_open():
                out.extend([None] * len(chunk))  # llm_bypass_circuit_open
                continue
            try:
                results = with_retries(
                    lambda c=chunk: self._call(c), self.policy
                )
            except IngestionError:
                self.breaker.record_failure()
                out.extend([None] * len(chunk))
                continue
            for res in results:
                text = res.get("text") if isinstance(res, dict) else None
                if text and str(text).strip():
                    self.breaker.record_success()
                    out.append(str(text))
                else:
                    # empty filter output = failure (web.py:292-296)
                    self.breaker.record_failure()
                    out.append(None)
        return out


class HttpOcrProvider:
    """Docling-serve-shaped OCR/convert provider — the reference's
    docling OCR boundary (``handlers/file.py:196-299``: scanned PDFs
    rasterized + OCR'd to markdown) behind the same provider-interface
    pattern as the embedder: the engine stays hermetic by default
    (scanned PDFs quarantine with ``ERR_CONVERSION_STUBBED``) and a
    deployment points this client at its OCR service to close the gap.

    Request:  ``{"model": m, "documents": ["<base64>", ...]}`` with
    ``Authorization: Bearer <key>`` resolved per call (hot-swap).
    Response: ``{"results": [{"text": "...", "pages": n}, ...]}`` —
    one result per document, count-validated; a null/absent ``text``
    marks a document the provider could not OCR (the caller keeps its
    quarantine row).  One HTTP call per ``max_batch`` documents,
    retried on the transient taxonomy like every other provider."""

    def __init__(
        self,
        endpoint: str,
        model: str = "docling-ocr",
        key_provider: Callable[[], str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        policy: RetryPolicy | None = None,
        max_batch: int = 16,
    ):
        self.endpoint = endpoint
        self.model = model
        self.key_provider = key_provider or (lambda: "")
        self.timeout_s = timeout_s
        self.policy = policy or RetryPolicy()
        self.max_batch = max_batch

    def _call(self, blobs: list[bytes]) -> list[dict]:
        import base64

        payload = {
            "model": self.model,
            "documents": [
                base64.b64encode(bytes(b)).decode("ascii") for b in blobs
            ],
        }
        key = self.key_provider()
        headers = {"Authorization": f"Bearer {key}"} if key else {}
        body = _post_json(self.endpoint, payload, headers, self.timeout_s)
        results = body.get("results")
        if not isinstance(results, list) or len(results) != len(blobs):
            raise IngestionError(
                ERR_PROVIDER_SHAPE,
                f"expected {len(blobs)} OCR results, got "
                f"{len(results) if isinstance(results, list) else type(results).__name__}",
            )
        return results

    def ocr_batch(self, blobs: Sequence[bytes]) -> list[dict]:
        """Chunked + retried batch OCR (worker-side: one call per
        ``max_batch`` documents, never per row)."""
        out: list[dict] = []
        for i in range(0, len(blobs), self.max_batch):
            chunk = list(blobs[i : i + self.max_batch])
            out.extend(with_retries(lambda c=chunk: self._call(c), self.policy))
        return out


class HttpReranker:
    """Jina/Cohere-shaped rerank client (adapter/reranker/client.go:31-160).

    Request:  ``{"model": m, "query": q, "documents": [...],
    "top_n": n}`` with ``Authorization: Bearer <key>`` resolved per
    call.  Response: ``{"results": [{"index": i, "relevance_score": s},
    ...]}``; documents are reordered by score descending (ties keep the
    provider's order), indices the provider omitted keep their original
    relative order at the tail — the reference tolerates partial
    results the same way (client.go:121-146).

    Satisfies operators/rerank.Reranker, so it drops into
    ``apply_rerank`` wherever IdentityReranker/LocalOverlapReranker do.
    """

    def __init__(
        self,
        endpoint: str,
        model: str = "jina-reranker-v2-base-multilingual",
        key_provider: Callable[[], str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        policy: RetryPolicy | None = None,
    ):
        self.endpoint = endpoint
        self.model = model
        self.key_provider = key_provider or (lambda: "")
        self.timeout_s = timeout_s
        self.policy = policy or RetryPolicy()

    def rerank(self, query: str, contents: Sequence[str]) -> list[int]:
        if not contents:
            return []
        payload = {
            "model": self.model,
            "query": query,
            "documents": list(contents),
            "top_n": len(contents),
        }
        key = self.key_provider()
        headers = {"Authorization": f"Bearer {key}"} if key else {}
        body = with_retries(
            lambda: _post_json(self.endpoint, payload, headers, self.timeout_s),
            self.policy,
        )
        results = body.get("results")
        if not isinstance(results, list):
            raise IngestionError(ERR_PROVIDER_SHAPE, "missing results[]")
        # The payload shape doesn't promise sorted results: order by
        # relevance_score descending ourselves (stable — ties and
        # score-less entries keep the provider's order).
        ranked = sorted(
            (r for r in results if isinstance(r, dict)),
            key=lambda r: -(
                r["relevance_score"]
                if isinstance(r.get("relevance_score"), (int, float))
                else float("-inf")
            ),
        )
        order: list[int] = []
        seen = set()
        for r in ranked:
            i = r.get("index")
            if isinstance(i, int) and 0 <= i < len(contents) and i not in seen:
                order.append(i)
                seen.add(i)
        order += [i for i in range(len(contents)) if i not in seen]
        return order


class HttpTokenizer:
    """HTTP-shaped batch tokenizer for PRODUCTION-faithful token
    counts (tiktoken/SentencePiece-server convention: POST a text
    batch, get one count per text back).

    The curation/packing/export family budgets shards on the hermetic
    whitespace/BPE-ish estimates in ``functions/text.py`` by default —
    fine for parity, but a real training pipeline packs against the
    ACTUAL tokenizer of the target model.  This provider is the slot
    for that: same retry/breaker/hot-key posture as ``HttpEmbedder``,
    and ``udf()`` drops straight into ``pack_shards`` /
    ``export_jsonl_shards`` via their ``token_count`` override.

    Request:  ``{"model": m, "texts": [...]}``
    Response: ``{"counts": [n0, n1, ...]}`` — one non-negative int per
    text, validated for count and type.
    """

    def __init__(
        self,
        endpoint: str,
        model: str = "cl100k_base",
        key_provider: Callable[[], str] | None = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        policy: RetryPolicy | None = None,
        max_batch: int = 256,
    ):
        self.endpoint = endpoint
        self.model = model
        self.key_provider = key_provider or (lambda: "")
        self.timeout_s = timeout_s
        self.policy = policy or RetryPolicy()
        self.max_batch = max_batch

    def _headers(self) -> dict[str, str]:
        key = self.key_provider()
        return {"Authorization": f"Bearer {key}"} if key else {}

    def _call(self, texts: list[str]) -> list[int]:
        body = _post_json(
            self.endpoint,
            {"model": self.model, "texts": texts},
            self._headers(),
            self.timeout_s,
        )
        counts = body.get("counts")
        if not isinstance(counts, list) or len(counts) != len(texts):
            raise IngestionError(
                ERR_PROVIDER_SHAPE,
                f"expected {len(texts)} counts, got "
                f"{len(counts) if isinstance(counts, list) else type(counts).__name__}",
            )
        for c in counts:
            if not isinstance(c, int) or isinstance(c, bool) or c < 0:
                raise IngestionError(
                    ERR_PROVIDER_SHAPE, "counts must be non-negative ints"
                )
        return counts

    def count_batch(self, texts: Sequence[str]) -> list[int]:
        """Chunked + retried batch count (usable driver- or worker-side)."""
        out: list[int] = []
        for i in range(0, len(texts), self.max_batch):
            chunk = [t or "" for t in texts[i : i + self.max_batch]]
            out.extend(with_retries(lambda c=chunk: self._call(c), self.policy))
        return out

    def udf(self):
        """Arrow-batched pandas UDF ``string -> long``: one HTTP call
        per ``max_batch`` texts, retry/backoff inside the worker.
        Callable on a Column, so it satisfies the ``token_count``
        override contract of ``operators/sharding.pack_shards``."""
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        provider = self

        def _count(texts):
            return pd.Series(
                provider.count_batch(texts.tolist()), dtype="int64"
            )

        _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return F.pandas_udf(T.LongType())(_count)
