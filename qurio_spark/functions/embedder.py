"""Pluggable embedding providers (operator T6).

The reference embeds with Gemini ``gemini-embedding-001`` behind a
provider interface, hot-swapping the API key from settings
(internal/adapter/gemini/dynamic_embedder.go:30-56).  The rebuild keeps
the provider seam but ships a *deterministic local* default so the whole
engine is hermetic: a hashing-trick TF embedder (tokens -> md5 bucket ->
term-frequency vector -> L2 normalize).  Remote providers (Gemini etc.)
would slot in as another ``pandas_udf`` batch-calling the API — same
signature, never row-at-a-time.

Execution: a scalar Arrow-batched pandas UDF.  Batches of ~2k strings
cross to Python columnar, embed vectorized in numpy, and return
``array<float>`` — the 10-100x-over-row-UDF path the brief mandates for
the only genuinely-Python stage of the pipeline.
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % dim


def embed_text_py(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Pure-Python single-string embedder (driver-side query embedding,
    operator Q1 — the analogue of service.go:93-97)."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in _TOKEN_RE.split((text or "").lower()):
        if tok:
            v[_bucket(tok, dim)] += 1.0
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return [float(x) for x in v]


def hashing_tf_udf(dim: int = DEFAULT_DIM):
    """array<float> pandas UDF: deterministic hashing-TF embedding."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            out.append(np.asarray(embed_text_py(t or "", dim), dtype=np.float32))
        return pd.Series(out)

    return embed


class Embedder(Protocol):
    """Provider contract: driver-side query embedding (Q1) + an
    Arrow-batched column UDF for corpus embedding (T6).  Satisfied by
    HashingEmbedder (hermetic default) and providers.HttpEmbedder
    (Gemini-shaped remote)."""

    def embed_query(self, text: str) -> list[float]: ...

    def udf(self): ...


class HashingEmbedder:
    """Default provider: deterministic, hermetic, dim-configurable."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def embed_query(self, text: str) -> list[float]:
        return embed_text_py(text, self.dim)

    def udf(self):
        return hashing_tf_udf(self.dim)
