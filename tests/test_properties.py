"""Property-based tests (hypothesis) for the engine's trickiest pure
functions: the chunker cascade and the portable hash family.  These
fuzz the invariants the golden tests can't enumerate.
"""

from hypothesis import given, settings, strategies as st

from qurio_spark.functions.hashing import (
    MERSENNE_61,
    hash64_py,
    minhash_coeffs,
)
from qurio_spark.operators.chunker import (
    chunk_markdown,
    clean_markdown_noise,
    is_noise_chunk,
)

# text that exercises headers, fences, paragraphs and plain prose
MD = st.text(
    alphabet=st.sampled_from(list("abcdefgh \n#`*-[]()!.:/=")), max_size=2000
)


class TestChunkerProperties:
    @given(MD, st.integers(min_value=8, max_value=64))
    @settings(max_examples=150, deadline=None)
    def test_chunk_budget_or_unsplittable(self, text, max_tokens):
        """Every emitted chunk fits the budget unless it has no split
        point left (a single overlong word, or a re-wrapped code fence
        whose single line exceeds the budget)."""
        max_chars = max_tokens * 4
        for c in chunk_markdown(text, max_tokens, 0):
            if len(c.content) > max_chars:
                body = c.content
                if body.startswith("```"):
                    # fence re-wrap: every interior line respects the
                    # budget unless the line itself is unsplittable
                    inner = body.split("\n")[1:-1]
                    assert all(
                        len(l) + 1 <= max_chars or " " not in l.strip()
                        for l in inner
                    ) or len(inner) <= 1
                else:
                    assert " " not in body, body

    @given(MD, st.integers(min_value=8, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_deterministic_and_no_noise_emitted(self, text, max_tokens):
        a = chunk_markdown(text, max_tokens, 0)
        b = chunk_markdown(text, max_tokens, 0)
        assert a == b
        assert all(not is_noise_chunk(c.content) for c in a)

    @given(MD)
    @settings(max_examples=100, deadline=None)
    def test_clean_noise_idempotent(self, text):
        once = clean_markdown_noise(text)
        assert clean_markdown_noise(once) == once

    @given(MD, st.integers(min_value=8, max_value=64), st.integers(0, 100))
    @settings(max_examples=75, deadline=None)
    def test_overlap_param_inert(self, text, max_tokens, overlap):
        assert chunk_markdown(text, max_tokens, 0) == chunk_markdown(
            text, max_tokens, overlap
        )


class TestHashProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_hash64_range_and_determinism(self, s):
        h = hash64_py(s)
        assert 0 <= h < 16**15
        assert hash64_py(s) == h

    @given(st.integers(min_value=1, max_value=32), st.integers(0, 1000))
    @settings(max_examples=50, deadline=None)
    def test_minhash_coeffs_valid_family(self, n, seed):
        coeffs = minhash_coeffs(n, seed)
        assert len(coeffs) == n
        for a, b in coeffs:
            assert 1 <= a < MERSENNE_61 or a == 1
            assert 0 <= b < MERSENNE_61
