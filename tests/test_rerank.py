"""Q4 rerank: identity permutation, deterministic overlap scorer,
stable tie handling (retrieval/service.go:112-133 semantics)."""

from qurio_spark.operators.rerank import (
    IdentityReranker,
    LocalOverlapReranker,
    apply_rerank,
)

ROWS = [
    {"content": "alpha beta gamma", "id": 1},
    {"content": "spark hash join internals", "id": 2},
    {"content": "hash tables", "id": 3},
    {"content": "unrelated prose", "id": 4},
]


def test_identity_keeps_order():
    out = apply_rerank(list(ROWS), "hash join", IdentityReranker())
    assert [r["id"] for r in out] == [1, 2, 3, 4]


def test_overlap_reorders_by_query_terms():
    out = apply_rerank(list(ROWS), "hash join spark", LocalOverlapReranker())
    assert [r["id"] for r in out] == [2, 3, 1, 4]  # 3 hits, 1 hit, 0, 0


def test_overlap_ties_keep_original_order():
    rows = [{"content": "x y"}, {"content": "y z"}, {"content": "z x"}]
    order = LocalOverlapReranker().rerank("nothing matches", [r["content"] for r in rows])
    assert order == [0, 1, 2]


def test_empty_results():
    assert apply_rerank([], "q", LocalOverlapReranker()) == []
    assert IdentityReranker().rerank("q", []) == []
