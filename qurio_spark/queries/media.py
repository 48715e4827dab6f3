"""Multimodal geometry queries on deterministic binary fixtures.

The Spark side REALLY parses image bytes (``decode_image_meta`` over
generated BMP headers) and derives resize targets with ``resize_spec``;
the oracle re-computes the same aspect-preserving geometry in SQL from
the fixture's known dimensions, so the scale/clamp/NULL-guard semantics
are hash-checked end-to-end.  Reference parity: docling rasterization
sizing (handlers/file.py:196-299) generalized to the engine side.
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import DataFrame, SparkSession, functions as F


def _bmp_bytes(w: int, h: int) -> bytes:
    """Header-honest BI_RGB BMP (BITMAPINFOHEADER, no pixel payload —
    ``decode_image_meta`` is header-only by contract)."""
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return _struct.pack("<2sIHHI", b"BM", 14 + 40, 0, 0, 54) + info


#: (path, payload) — dims chosen so no rounding step lands on an exact
#: .5 product (HALF_UP vs float-repr divergence between engines).
_MEDIA_FIXTURE = [
    ("img/wide.bmp", _bmp_bytes(448, 100)),   # downscale 2x
    ("img/small.bmp", _bmp_bytes(64, 48)),    # under max_side: untouched
    ("img/tall.bmp", _bmp_bytes(3, 900)),     # extreme aspect: 1px floor
    ("img/zero.bmp", _bmp_bytes(0, 0)),       # degenerate header dims
    ("img/bad.bin", b"\x00not an image\x00"),  # unparseable payload
]

#: the dims the fixture headers declare, for the oracle's VALUES side
MEDIA_FIXTURE_DIMS = [
    ("img/wide.bmp", 448, 100),
    ("img/small.bmp", 64, 48),
    ("img/tall.bmp", 3, 900),
    ("img/zero.bmp", None, None),
    ("img/bad.bin", None, None),
]

RESIZE_MAX_SIDE = 224


def q_resize_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qurio_spark.sources.multimodal import decode_image_meta, resize_spec

    df = spark.createDataFrame(
        [(p, bytearray(b)) for p, b in _MEDIA_FIXTURE],
        "path string, content binary",
    )
    meta = df.withColumn("meta", decode_image_meta("content")).select(
        "path",
        # degenerate (0x0) headers surface as NULL dims, same as
        # unparseable payloads — the oracle can't see `valid`
        F.when(F.col("meta.valid"), F.col("meta.width")).alias("width"),
        F.when(F.col("meta.valid"), F.col("meta.height")).alias("height"),
    )
    # no orderBy: the driver compare is order-insensitive, and a sort
    # would add a range-partitioner sampling job that evaluates the
    # pandas UDF a second time
    return resize_spec(meta, max_side=RESIZE_MAX_SIDE)


def _wav_bytes(
    samples: list[list[float]],
    bits: int = 16,
    fmt_tag: int = 1,
    rate: int = 8000,
    truncate_payload: int = 0,
) -> bytes:
    """Real-payload WAV: ``samples`` is a list of frames, each a list
    of per-channel values in [-1, 1].  Encodes honestly per the tag
    (int PCM round-trips exactly for values that are k/2^(bits-1))."""
    channels = len(samples[0])
    flat = [v for frame in samples for v in frame]
    if fmt_tag == 3:
        payload = b"".join(_struct.pack("<f", v) for v in flat)
    elif bits == 16:
        payload = b"".join(_struct.pack("<h", round(v * 32768)) for v in flat)
    elif bits == 8:
        payload = bytes(round(v * 128) + 128 for v in flat)
    else:
        raise ValueError(bits)
    declared = len(payload)
    if truncate_payload:
        payload = payload[:-truncate_payload]
    fmt = b"fmt " + _struct.pack(
        "<IHHIIHH", 16, fmt_tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    data = b"data" + _struct.pack("<I", declared) + payload
    body = b"WAVE" + fmt + data
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def _tone(n: int, step: int, scale: int = 32768, span: int = 1201) -> list[float]:
    """Deterministic sawtooth-ish mono signal whose values are exact
    k/scale dyadic rationals with |k| <= span//2 (bit-exact through
    int PCM encode/decode and through decimal literals in the oracle
    SQL; keep span//2 < scale so samples stay inside [-1, 1])."""
    return [((i * step + 7) % span - span // 2) / scale for i in range(n)]


#: (path, frames, bits, fmt_tag, truncate) — every branch of
#: _wav_pcm_mono: int16 mono, int16 stereo (channel average), uint8,
#: IEEE float32, a compressed codec (mu-law), a truncated data chunk.
_AUDIO_FIXTURE_SPEC = [
    ("au/mono16.wav", [[v] for v in _tone(48, 211)], 16, 1, 0),
    (
        "au/stereo16.wav",
        [
            [a, b]
            for a, b in zip(_tone(30, 157), _tone(30, 89))
        ],
        16,
        1,
        0,
    ),
    ("au/mono8.wav", [[v] for v in _tone(40, 67, scale=128, span=241)], 8, 1, 0),
    ("au/float32.wav", [[v] for v in _tone(36, 311, scale=1024)], 32, 3, 0),
    ("au/mulaw.wav", [[v] for v in _tone(16, 211)], 16, 7, 0),
    ("au/truncated.wav", [[v] for v in _tone(16, 211)], 16, 1, 4),
]


def _audio_fixture() -> list[tuple[str, bytes]]:
    return [
        (p, _wav_bytes(frames, bits=bits, fmt_tag=tag, truncate_payload=tr))
        for p, frames, bits, tag, tr in _AUDIO_FIXTURE_SPEC
    ]


def _audio_fixture_mono() -> list[tuple[str, list[float] | None]]:
    """The mono-mixed sample values each fixture's bytes encode (None
    for the undecodable ones) — the oracle's ground truth."""
    out = []
    for p, frames, bits, tag, tr in _AUDIO_FIXTURE_SPEC:
        if tag not in (1, 3) or tr:
            out.append((p, None))
            continue
        out.append((p, [sum(fr) / len(fr) for fr in frames]))
    return out


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM WAV decode → loudness/shape features (RMS, peak,
    zero-crossing rate) — the audio twin of ``resize_targets``: the
    Spark side REALLY decodes sample bytes (numpy, Arrow-batched); the
    oracle recomputes the features from the fixture's declared sample
    values, so the decode path is hash-checked end-to-end."""
    from qurio_spark.sources.multimodal import audio_features

    df = spark.createDataFrame(
        [(p, bytearray(b)) for p, b in _audio_fixture()],
        "path string, content binary",
    )
    feat = df.withColumn("f", audio_features("content"))
    round6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return feat.select(
        "path",
        F.col("f.n_samples").alias("n_samples"),
        round6(F.col("f.rms")).alias("rms"),
        round6(F.col("f.peak")).alias("peak"),
        round6(F.col("f.zcr")).alias("zcr"),
        F.col("f.valid").alias("valid"),
    )


def audio_features_sql() -> str:
    rows = []
    for p, mono in _audio_fixture_mono():
        if mono is None:
            continue
        for i, v in enumerate(mono):
            rows.append(f"('{p}', {i}, {v!r})")
    values = ", ".join(rows)
    invalid = ", ".join(
        f"('{p}', NULL, NULL, NULL, NULL, FALSE)"
        for p, mono in _audio_fixture_mono()
        if mono is None
    )
    return f"""
WITH s0(path, idx, v0) AS (VALUES {values}),
-- exact decimal literals arrive as DECIMAL; all feature math is IEEE
s AS (SELECT path, idx, CAST(v0 AS DOUBLE) AS v FROM s0),
d AS (
  SELECT path, idx, v,
         lag(v) OVER (PARTITION BY path ORDER BY idx) AS pv
  FROM s
),
f AS (
  SELECT path,
         CAST(count(*) AS INT) AS n_samples,
         sqrt(avg(v * v)) AS rms,
         max(abs(v)) AS peak,
         avg(CASE WHEN pv IS NULL THEN NULL
                  WHEN (v >= 0) <> (pv >= 0) THEN 1.0 ELSE 0.0 END) AS zcr
  FROM d GROUP BY path
)
SELECT path, n_samples,
       floor(rms * 1000000 + 0.5) / 1000000 AS rms,
       floor(peak * 1000000 + 0.5) / 1000000 AS peak,
       floor(zcr * 1000000 + 0.5) / 1000000 AS zcr,
       TRUE AS valid
FROM f
UNION ALL
SELECT * FROM (VALUES {invalid})
  t(path, n_samples, rms, peak, zcr, valid)"""


def resize_targets_sql(max_side: int = RESIZE_MAX_SIDE) -> str:
    values = ", ".join(
        f"('{p}', {w if w is not None else 'NULL'}, "
        f"{h if h is not None else 'NULL'})"
        for p, w, h in MEDIA_FIXTURE_DIMS
    )
    return f"""
WITH imgs(path, width, height) AS (VALUES {values}),
sized AS (
    SELECT path, width, height,
           least(1.0, {max_side}.0 / greatest(width, height)) AS s,
           width IS NOT NULL AND height IS NOT NULL
             AND width > 0 AND height > 0 AS ok
    FROM imgs
)
SELECT path, width, height,
       CASE WHEN ok THEN greatest(CAST(floor(width * s + 0.5) AS INT), 1) END
         AS target_width,
       CASE WHEN ok THEN greatest(CAST(floor(height * s + 0.5) AS INT), 1) END
         AS target_height,
       CASE WHEN ok THEN floor(s * 1000000 + 0.5) / 1000000 END
         AS resize_scale
FROM sized
ORDER BY path"""
