"""Bloom-filter semi-join pushdown — the runtime-filter pattern.

At 100 TB the expensive part of a selective join is SHUFFLING the big
side: every probe row pays the exchange even though most will not
match.  Engines solve this with runtime filters (Spark's own
InjectRuntimeFilter inserts a bloom under AQE for some shapes; this
module is the explicit, always-available form): build a Bloom filter
over the BUILD side's join keys (distributed: one partial-agg
shuffle over filter slots, never a key collect), ship it to the
probe side as a LITERAL bitmap inside a column expression, and drop
non-matching rows AT THE SCAN — before the join exchange ever sees
them.  The final join still runs (bloom false positives must be
re-checked), so results are EXACTLY the plain join's; only the
shuffled volume changes.

Engine-portable construction (no engine-private hash): k bit
positions per key derive from the md5-based ``hash64`` split into two
31-bit halves h1, h2 with position_i = (h1 + i*h2) mod m (the classic
Kirsch-Mitzenmacher double hashing), so the same filter is computable
in plain SQL and tests can pin membership bit-for-bit.

The bitmap is m bits packed into ceil(m/64) longs.  The distributed
build: each key row explodes to its k (slot, bit) pairs, a
groupBy(slot) bit_or merges them — one narrow shuffle of at most
k * |build| tiny rows, then ceil(m/64) rows reach the driver.  The
probe-side test is pure codegen: k extracts against an array<long>
literal, no join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from qurio_spark.functions.hashing import hash64

_MASK31 = (1 << 31) - 1


def _h1h2(col: Column):
    h = hash64(col.cast("string"))
    h1 = (h % F.lit(_MASK31 + 1)).cast("long")
    h2 = (F.shiftrightunsigned(h, 31) % F.lit(_MASK31 + 1)).cast("long")
    # h2 must be odd-ish / nonzero so positions spread; the +1 keeps it
    # nonzero without biasing (same formula both build and probe side)
    return h1, h2 + F.lit(1)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
) -> list[int]:
    """Distributed Bloom build -> list of ceil(m/64) longs (the
    bitmap), via explode-to-(slot, bit) + groupBy(slot) bit_or.  Only
    the bitmap rows reach the driver — never the keys."""
    n_words = (m_bits + 63) // 64
    h1, h2 = _h1h2(F.col(key_col))
    pos = F.array(
        *[((h1 + F.lit(i) * h2) % F.lit(m_bits)) for i in range(k_hashes)]
    )
    slots = (
        keys.select(F.explode(pos).alias("__p"))
        .select(
            (F.col("__p") / 64).cast("int").alias("__slot"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
            ).alias("__bit"),
        )
        .groupBy("__slot")
        .agg(F.bit_or("__bit").alias("__word"))
        .collect()
    )
    words = [0] * n_words
    for r in slots:
        words[r["__slot"]] = r["__word"]
    return words


def bloom_might_contain(
    key_col: Column | str,
    bitmap: list[int],
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
) -> Column:
    """Membership test as a pure column expression against the literal
    bitmap: k double-hash positions, each an element_at + bit test —
    whole-stage codegen, zero Python, zero joins."""
    if isinstance(key_col, str):
        key_col = F.col(key_col)
    lit = F.array(*[F.lit(int(w)).cast("long") for w in bitmap])
    h1, h2 = _h1h2(key_col)
    cond = F.lit(True)
    for i in range(k_hashes):
        p = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        word = F.element_at(lit, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    m_bits: int = 1 << 13,
    k_hashes: int = 5,
    how: str = "left_semi",
) -> DataFrame:
    """Exact semi/inner join with a bloom pre-filter on the probe side:
    rows that cannot match are dropped at the scan, the surviving
    sliver joins normally (false positives re-checked), so the result
    set is IDENTICAL to ``probe.join(build, on, how)`` — pinned by the
    plain-join oracle.  The win is shuffle volume: at a 1% match rate
    the exchange moves ~1% of the probe table (+ the bloom's false-
    positive rate) instead of all of it."""
    bitmap = bloom_build(build.select(on), on, m_bits, k_hashes)
    pre = probe.filter(bloom_might_contain(F.col(on), bitmap, m_bits, k_hashes))
    return pre.join(build, on, how)
