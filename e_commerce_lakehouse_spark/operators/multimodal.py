"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data table carries media as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators so bytes never cross the
JVM↔Python boundary row-at-a-time.

REAL here: the Spark-side plumbing — schema, partitioning by payload
size, UDF signatures, Arrow batch shapes, error rows. STUBBED here: the
actual codecs (PIL/ffmpeg are not in this container). ``FakeCodec`` is a
deterministic toy container format (magic + width + height + payload)
that the tests synthesize and the operators genuinely parse; feeding a
real JPEG raises ``UnsupportedMediaError`` exactly where a PIL call
would slot in (marked NOTE-REAL-DECODER below).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_codec", T.StringType(), True),
    ]
)

_MAGIC = b"FAKE"


class UnsupportedMediaError(NotImplementedError):
    """Raised for real-world codecs this container can't decode."""


class FakeCodec:
    """Deterministic toy container: b'FAKE' + u16 width + u16 height +
    width*height payload bytes (row-major, value = (x*31+y*17+seed)%251)."""

    @staticmethod
    def encode(width: int, height: int, seed: int = 0) -> bytes:
        body = bytes(
            (x * 31 + y * 17 + seed) % 251 for y in range(height) for x in range(width)
        )
        return _MAGIC + struct.pack("<HH", width, height) + body

    @staticmethod
    def decode(payload: bytes):
        if payload[:4] != _MAGIC:
            # NOTE-REAL-DECODER: a production build calls PIL.Image.open /
            # soundfile.read / av.open here.
            raise UnsupportedMediaError("unknown media container (not FAKE)")
        w, h = struct.unpack("<HH", payload[4:8])
        body = payload[8 : 8 + w * h]
        if len(body) != w * h:
            raise ValueError("truncated payload")
        return w, h, body


def synth_media_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table (driver-side build is fine at test scale;
    payloads are the FakeCodec container)."""
    rows = []
    for i in range(n):
        w = 8 + (i * 7 + seed) % 24
        h = 8 + (i * 13 + seed) % 24
        rows.append((i, "image", FakeCodec.encode(w, h, seed + i), w, h, "fake"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes int, "
    "sum_value long, mean_value double, ok boolean, error string"
)


def decode_and_featurize(df: DataFrame) -> DataFrame:
    """mapInPandas decode + cheap feature extraction. One Arrow batch in,
    one batch out; malformed payloads become error ROWS (the rejected-rows
    pattern, `orders_etl.py:204-209`), never task failures. ``sum_value``
    is an exact integer body checksum (oracle-comparable without float
    rounding concerns); ``mean_value`` is the float convenience form."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    w, h, body = FakeCodec.decode(bytes(payload))
                    s = sum(body)
                    mean = s / max(1, len(body))
                    out.append((mid, kind, w, h, len(body), s, round(mean, 4), True, None))
                except (UnsupportedMediaError, ValueError) as e:
                    out.append((mid, kind, None, None, None, None, None, False, str(e)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "width", "height", "n_bytes",
                    "sum_value", "mean_value", "ok", "error",
                ],
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def media_from_ids(df: DataFrame, id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Distributed media synthesis: one FakeCodec container per input row,
    encoded inside mapInPandas (Arrow batches — payload bytes never cross
    the boundary row-at-a-time). Size/seed formulas match synth_media_df
    so features are a pure closed-form function of the id, which is what
    lets a SQL oracle verify the decode path end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                w = 8 + (i * 7 + seed) % 24
                h = 8 + (i * 13 + seed) % 24
                out.append((i, "image", FakeCodec.encode(w, h, seed + i), w, h, "fake"))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "payload", "meta_width", "meta_height", "meta_codec",
                ],
            )

    return df.select(id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize inside mapInPandas (numpy-free toy kernel on
    the fake container; a real build swaps in PIL.Image.resize)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = FakeCodec.decode(bytes(payload))
                pix = bytes(
                    body[(y * h // target_h) * w + (x * w // target_w)]
                    for y in range(target_h)
                    for x in range(target_w)
                )
                out.append(
                    (mid, target_w, target_h,
                     _MAGIC + struct.pack("<HH", target_w, target_h) + pix)
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "payload"])

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video-kind rows: JVM-side filter on frame index
    derived from media_id (stand-in for container-level frame iteration —
    the point is the PLUMBING: pushdown-able predicate, no Python)."""
    return df.where(F.pmod(F.col("media_id"), every_k) == 0)
