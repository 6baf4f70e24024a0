"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed in Arrow batches.

Design for 100 TB of mixed media:
- media is an opaque ``binary`` column plus a typed metadata struct —
  Spark shuffles/stores bytes without interpreting them, and metadata
  (dimensions, sample rate, frame counts) stays queryable/prunable
  without touching payloads;
- every per-item transform goes through ``mapInPandas`` so payloads
  cross the Python boundary in Arrow record batches, never row-at-a-
  time;
- REAL codecs (PIL/ffmpeg/librosa) are not available in this
  environment, so decoding is STUBBED: ``deterministic_fake_decoder``
  produces a reproducible array from the payload bytes (tests and the
  q38 catalog entry run against it), and ``real_decoder`` raises
  ``NotImplementedError`` marking exactly where a codec slots in. The
  Spark-side plumbing — schema, batching, partition behavior, UDF
  signatures — is real and tested either way.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# (payload, media_type) -> decoded sample array (H x W [x C] for
# image/video frames, 1-D for audio)
Decoder = Callable[[bytes, str], np.ndarray]

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, media_type: str, id_col: str = "doc_id"
) -> DataFrame:
    """Normalize any binary column into the engine's media layout:
    (id, media_type, payload, meta). Metadata here is derived
    deterministically from payload size — a real ingest fills it from
    container headers without decoding payloads."""
    blen = F.octet_length(F.col(payload_col))
    meta = F.struct(
        (blen % 640).cast("int").alias("width"),
        ((blen / 640).cast("long") % 480).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (blen % 32 + 1).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).alias("payload"),
        meta.alias("meta"),
    )


def real_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """The real-codec slot. Image/audio/video libraries are not
    installed in this environment — plug PIL.Image.open /
    librosa.load / an ffmpeg frame grabber in here."""
    raise NotImplementedError(
        "no media codec available in this environment; inject a decoder "
        "(see deterministic_fake_decoder for the contract)"
    )


def deterministic_fake_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Reproducible stand-in decode: an 8×8 uint8 'image' (or 64-sample
    'waveform') whose cells are a byte-fold of the payload. Same bytes
    → same array on any worker, so downstream features are
    oracle-checkable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    folded = np.resize(arr, 64)
    if media_type == "audio":
        return folded.astype(np.float32) / 255.0
    return folded.reshape(8, 8)


def decode_features(
    media: DataFrame, decoder: Optional[Decoder] = None
) -> DataFrame:
    """Decode each payload (Arrow-batched) and emit per-item features:
    byte_len, mean/std of the decoded sample, and an 8-dim pooled
    feature vector. One pass, map-only — partitioning is inherited, no
    shuffle."""
    dec = decoder or deterministic_fake_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                a = dec(bytes(payload), mtype).astype(np.float64).ravel()
                pooled = np.resize(a, (8, a.size // 8 or 1)).mean(axis=1)
                feats.append((len(payload), a.mean(), a.std(), pooled.tolist()))
            out = pd.DataFrame(
                feats, columns=["byte_len", "sample_mean", "sample_std", "feature"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("byte_len", T.LongType()),
            T.StructField("sample_mean", T.DoubleType()),
            T.StructField("sample_std", T.DoubleType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )
    return media.mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video payloads: explode n_frames into frame
    indices, keep every ``every_n``-th. Pure column ops — the payload
    itself is NOT exploded (frame extraction happens at decode time),
    so the blow-up is index rows, not bytes × frames."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    kept = F.filter(idx, lambda i: i % every_n == 0)
    return media.select(
        "doc_id",
        "media_type",
        F.explode(kept).alias("frame_index"),
        "meta",
    )


def resize_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize as metadata rewrite: the decode-time target shape is part
    of the typed metadata (decoders read it), so a resize never touches
    payload bytes in the plan."""
    new_meta = F.struct(
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return media.withColumn("meta", new_meta)
