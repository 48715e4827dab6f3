"""Rerank (operator Q4) — identity default + pluggable provider.

The reference posts the top-k contents to Jina/Cohere and reorders by
the returned index list; provider 'none' is the identity permutation
(internal/retrieval/service.go:112-133, adapter/reranker/client.go:
31-160, dynamic_client.go:29-36).  Top-k is tiny (<= 50), so reranking
is driver-side post-processing, exactly like the reference; a remote
provider drops in as another ``Reranker``.
"""

from __future__ import annotations

from typing import Protocol, Sequence


class Reranker(Protocol):
    def rerank(self, query: str, contents: Sequence[str]) -> list[int]:
        """-> relevance-ordered indices into ``contents``."""


class IdentityReranker:
    """provider 'none' (dynamic_client.go:29-36)."""

    def rerank(self, query: str, contents: Sequence[str]) -> list[int]:
        return list(range(len(contents)))


class LocalOverlapReranker:
    """Deterministic local cross-scorer for hermetic tests: orders by
    token-overlap with the query (stable: ties keep original order).
    Stands in for a cross-encoder; same contract as a remote provider.
    """

    def rerank(self, query: str, contents: Sequence[str]) -> list[int]:
        import re

        q = {t for t in re.split(r"[^a-z0-9]+", query.lower()) if t}
        scored = []
        for i, c in enumerate(contents):
            toks = {t for t in re.split(r"[^a-z0-9]+", (c or "").lower()) if t}
            scored.append((-len(q & toks), i))
        return [i for _, i in sorted(scored)]


def apply_rerank(rows: list, query: str, reranker: Reranker, content_key: str = "content") -> list:
    """Reorder a collected top-k result list (service.go:112-133)."""
    order = reranker.rerank(query, [r[content_key] for r in rows])
    return [rows[i] for i in order]
