"""Deterministic cache lifetimes for operators that persist
intermediates (VERDICT r14 "What's wrong" #3).

``curate_corpus``, ``lm_buckets``, ``pack_shards``/``pack_sequences``
and ``distributed_cumsum`` persist narrow frames that two plan branches
consume; before r15 those caches lived until Spark evicted them, so a
long session curating many corpora accumulated cached frames.  The
fix is a handle protocol: every operator that persists attaches the
cached frames to the DataFrame it returns, and callers release them
deterministically once the result is materialized:

    kept = curate_corpus(docs)
    kept.write.parquet(out)         # or .collect(), .count(), ...
    release_caches(kept)            # caches gone, no clearCache()

``release_caches`` is safe to call on any DataFrame (no-op when
nothing is attached) and is idempotent.  Operators that compose other
caching operators propagate handles with ``propagate_caches`` so the
outermost result releases the whole chain.

No reference counterpart (the reference engine has no caching layer);
this is lifecycle plumbing for the §2.8 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_qurio_cached_frames"


def attach_caches(out: DataFrame, frames) -> DataFrame:
    """Record ``frames`` (already ``.persist()``-ed) as caches owned by
    ``out``.  Returns ``out`` for chaining."""
    existing = list(getattr(out, _ATTR, ()))
    existing.extend(f for f in frames if f is not None)
    setattr(out, _ATTR, existing)
    return out


def propagate_caches(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move cache ownership from an intermediate frame to the frame the
    operator actually returns (the handles survive ``select``/``filter``
    wrapping, which produces new Python objects)."""
    frames = list(getattr(src, _ATTR, ()))
    if frames:
        attach_caches(dst, frames)
        setattr(src, _ATTR, [])
    return dst


def cached_frames(df: DataFrame) -> list[DataFrame]:
    """The caches currently owned by ``df`` (for tests/audits)."""
    return list(getattr(df, _ATTR, ()))


def release_caches(df: DataFrame) -> int:
    """Unpersist every cache attached to ``df``; returns how many were
    released.  Call AFTER the consuming action — unpersisting earlier
    would recompute the branches the cache exists to share."""
    frames = list(getattr(df, _ATTR, ()))
    for f in frames:
        f.unpersist()
    if frames:
        setattr(df, _ATTR, [])
    return len(frames)
