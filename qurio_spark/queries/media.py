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
