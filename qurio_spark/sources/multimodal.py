"""Multimodal column plumbing (training-data-pipeline extension).

Image/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, binaryFile ingestion,
Arrow-batched mapInPandas, partitioning — is real and tested; the
actual byte decoding is STUBBED (this container has no image/audio
libs): ``decode_image_meta`` parses only container headers (PNG/JPEG/
GIF dimensions — plain struct parsing, no codec), and
``extract_features`` computes a deterministic byte-histogram feature
vector standing in for a real vision embedding.  A production build
swaps ``_decode_pixels`` for PIL/libvips inside the same mapInPandas
contract.

The reference's closest operator is docling file conversion (S5,
handlers/file.py:196-299: binary -> markdown + metadata in a process
pool); this is its engine-side generalization.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modality", T.StringType(), True),  # image/audio/video/unknown
        T.StructField("content", T.BinaryType(), True),
        T.StructField("length", T.LongType(), True),
    ]
)

IMAGE_META = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)

_EXT_MODALITY = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source -> MEDIA_SCHEMA rows (S5's ingestion shape).
    At scale the source parallelizes by file; maxPartitionBytes bounds
    per-task memory."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = F.coalesce(
        F.create_map(*[F.lit(x) for kv in _EXT_MODALITY.items() for x in kv])[ext],
        F.lit("unknown"),
    )
    return df.select(
        "path",
        modality.alias("modality"),
        "content",
        F.col("length").cast("long").alias("length"),
    )


def _parse_image_header(data: bytes | None) -> tuple:
    """Header-only dimension sniffing (PNG/GIF/JPEG) — deterministic,
    no codecs.  Full pixel decode is intentionally NOT implemented."""
    if not data or len(data) < 12:
        return (None, None, None, False)
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = _struct.unpack(">II", data[16:24])
        return ("png", int(w), int(h), True)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _struct.unpack("<HH", data[6:10])
        return ("gif", int(w), int(h), True)
    if data[:2] == b"\xff\xd8":
        # walk JPEG segments to SOF0/SOF2
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = _struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                h, w = _struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", int(w), int(h), True)
            i += 2 + seg_len
        return ("jpeg", None, None, False)
    return (None, None, None, False)


def _decode_pixels(data: bytes):
    """Full decode — stubbed: no codec libraries in this environment.
    The mapInPandas contract around it is the real, tested surface."""
    raise NotImplementedError(
        "pixel decode requires an image codec library; swap this stub "
        "for PIL/libvips in production"
    )


@F.udf(returnType=IMAGE_META)
def decode_image_meta(content):
    return _parse_image_header(content)


FEATURE_DIM = 32


def extract_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas feature extractor: byte-histogram features (a
    deterministic stand-in for a vision encoder) over Arrow batches.
    Output schema: input columns minus content, plus
    features array<float>."""
    out_fields = [f for f in df.schema.fields if f.name != content_col]
    schema = T.StructType(
        out_fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )
    out_cols = [f.name for f in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf[content_col]:
                if data is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(data), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                v = hist.astype(np.float32)
                n = float(np.linalg.norm(v))
                feats.append(v / n if n > 0 else v)
            out = pdf[out_cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(gen, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* metadata: which frame indices a
    decoder would extract.  Decode itself is stubbed (see module doc);
    the column plumbing (arrays of frame indices per row, explode-ready)
    is the tested part."""
    est_frames = (F.col("length") / F.lit(100_000)).cast("int") + 1
    return df.withColumn(
        "sample_frames",
        F.sequence(F.lit(0), est_frames, F.lit(every_n)),
    )
