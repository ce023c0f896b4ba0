"""Multimodal columns: opaque binary payloads + typed metadata.

North-star operator family (BASELINE.json): images/audio/video ride
through the lake as ``binary`` columns with a typed metadata struct; all
per-item processing (decode, feature-extract, resize, frame-sample) runs
as Arrow-batched pandas over ``mapInPandas`` — map-only, zero shuffle,
linear at 100 TB.

The actual codec step is STUBBED (this container has no image/audio
libraries): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder computes
metadata from the bytes themselves.  The Spark-side plumbing — schemas,
UDF signatures, Arrow batch shapes, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as SPARK_T

MEDIA_SCHEMA = SPARK_T.StructType([
    SPARK_T.StructField("media_id", SPARK_T.LongType()),
    SPARK_T.StructField("media_type", SPARK_T.StringType()),  # image|audio|video
    SPARK_T.StructField("payload", SPARK_T.BinaryType()),
    SPARK_T.StructField(
        "meta",
        SPARK_T.StructType([
            SPARK_T.StructField("source", SPARK_T.StringType()),
            SPARK_T.StructField("n_bytes", SPARK_T.LongType()),
        ]),
    ),
])

DECODED_SCHEMA = SPARK_T.StructType([
    SPARK_T.StructField("media_id", SPARK_T.LongType()),
    SPARK_T.StructField("media_type", SPARK_T.StringType()),
    SPARK_T.StructField("n_bytes", SPARK_T.LongType()),
    SPARK_T.StructField("fingerprint", SPARK_T.StringType()),
    SPARK_T.StructField("width", SPARK_T.IntegerType()),
    SPARK_T.StructField("height", SPARK_T.IntegerType()),
    SPARK_T.StructField("byte_entropy", SPARK_T.DoubleType()),
])

FRAME_SCHEMA = SPARK_T.StructType([
    SPARK_T.StructField("media_id", SPARK_T.LongType()),
    SPARK_T.StructField("frame_index", SPARK_T.IntegerType()),
    SPARK_T.StructField("frame_bytes", SPARK_T.BinaryType()),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: documents → binary payloads with typed
    metadata (media_type assigned round-robin by doc_id)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec: derive (width, height) from a
    stable digest of the bytes.  Replace with PIL/ffmpeg off-container."""
    digest = hashlib.md5(payload).digest()
    return 16 + digest[0] % 64, 16 + digest[1] % 64


def _entropy(payload: bytes) -> float:
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    n = len(payload) or 1
    return round(-sum((c / n) * math.log2(c / n) for c in counts.values()), 6)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    ``fake=False`` raises NotImplementedError from the executors — the
    real codec isn't available in this environment; the pipeline shape is
    what's under test.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio codecs not "
                    "present in this environment; pass fake=True for the "
                    "deterministic test decoder"
                )
            payloads = pdf["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                "fingerprint": payloads.map(lambda p: hashlib.md5(bytes(p)).hexdigest()),
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
                "byte_entropy": payloads.map(lambda p: _entropy(bytes(p))),
            })

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for "video" payloads: fixed-size byte windows,
    exploded with frame indices — pure column ops (no Python loop over
    rows), so it stays JVM-side."""
    n_frames = F.least(
        F.ceil(F.octet_length("payload") / frame_size).cast("int"), F.lit(max_frames)
    )
    idx = F.sequence(F.lit(0), n_frames - 1)
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_index"),
            # substring is 1-based; binary slicing yields binary
            F.substring(F.col("payload"), i * frame_size + 1, frame_size).alias("frame_bytes"),
        ),
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select(
            "media_id",
            F.col("f.frame_index").alias("frame_index"),
            F.col("f.frame_bytes").alias("frame_bytes"),
        )
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize placeholder: passes metadata through with target dims set;
    the pixel transform itself needs a codec (NotImplemented on access)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "resize requires an image codec; wire PIL here off-container"
        )
        yield  # pragma: no cover — generator marker

    return df.mapInPandas(resize_batches, df.schema)
