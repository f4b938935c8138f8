"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
UDF signatures) is real and tested; the codec step itself is stubbed
behind ``DECODERS`` because no image/audio library ships in this
container — swap in a real decoder (PIL/torchaudio/ffmpeg) by replacing
one function, the distributed shape does not change.
"""
from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("digest", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _digest(payload: bytes) -> str:
    """sha256 over the payload's lowercase-hex form (not the raw bytes):
    deliberately chosen so an external SQL oracle can recompute it —
    DuckDB's hash functions are VARCHAR-only, and hex round-trips."""
    return hashlib.sha256(payload.hex().encode("ascii")).hexdigest()


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: derives a fixed-size
    feature vector from the payload digest (little-endian uint32 per
    4 digest bytes, scaled to [0,1)).  Replace with a real decode+embed
    step; the mapInPandas plumbing stays identical."""
    assert dim <= 8, "fake codec yields at most 8 features per digest"
    digest = hashlib.sha256(_digest(payload).encode("ascii")).digest()
    return [struct.unpack("<I", digest[4 * i:4 * i + 4])[0] / 2**32
            for i in range(dim)]


def real_decode(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "no media codec available in this environment; "
        "plug PIL/torchaudio here and pass decoder=real_decode")


def extract_features(media: DataFrame, dim: int = 8,
                     decoder: Callable[[bytes], list[float]] | None = None,
                     ) -> DataFrame:
    """binary payload → fixed-size feature vector via mapInPandas
    (Arrow batches; one python worker per partition — scale by
    repartitioning upstream on media_id)."""
    decode = decoder or (lambda p: _fake_decode(p, dim))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "digest": pdf["payload"].map(_digest),
                "feature": pdf["payload"].map(decode),
            })
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: payload = repeatable bytes per id."""
    rows = [(i, ("image", "audio", "video")[i % 3],
             hashlib.md5(str(i).encode()).digest() * (1 + i % 4),
             ("image/png", "audio/wav", "video/mp4")[i % 3],
             {"w": str(64 + i % 4), "h": str(64)})
            for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("target_w", T.IntegerType()),
    T.StructField("target_h", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("digest", T.StringType()),
])


def resize_images(media: DataFrame, w: int = 64, h: int = 64) -> DataFrame:
    """Resize pass over image payloads (audio/video rows pass through a
    kind filter upstream).  The codec is stubbed: the "resized" payload
    is a deterministic digest chain over (payload_hex, WxH) — an
    external oracle can recompute it — but the distributed shape is the
    real one: narrow mapInPandas, binary in → binary out, partitioning
    preserved, no shuffle.  Swap the body for PIL's resize and nothing
    else changes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hexes = pdf["payload"].map(bytes.hex)
            digests = hexes.map(
                lambda x: hashlib.sha256(
                    f"{x}:{w}x{h}".encode("ascii")).hexdigest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "target_w": w,
                "target_h": h,
                "payload": digests.map(bytes.fromhex),
                "digest": digests,
            })

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_digest", T.StringType()),
])


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling for video payloads: each video row fans out to
    ceil(n_frames/stride) frame rows — the 1→N row-explosion shape real
    frame extraction has (each output row would carry the decoded frame;
    here a deterministic per-frame digest stands in for the pixels).
    Fake frame count = 1 + n_bytes % 5 so fixtures exercise ragged
    fan-out.  mapInPandas keeps it narrow: the fan-out happens inside
    the Arrow batch, no shuffle, no driver involvement."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["kind"] == "video"]
            ids, idxs, digs = [], [], []
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                d = _digest(payload)
                n_frames = 1 + len(payload) % 5
                for i in range(0, n_frames, stride):
                    ids.append(mid)
                    idxs.append(i)
                    digs.append(hashlib.sha256(
                        f"{d}:{i}".encode("ascii")).hexdigest())
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_digest": pd.Series(digs,
                                                          dtype="object")})

    return media.mapInPandas(batches, FRAME_SCHEMA)
