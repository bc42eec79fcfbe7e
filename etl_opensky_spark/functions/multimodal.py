"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``FAKE_DECODERS`` (deterministic fakes) / ``NotImplementedError``
— but everything Spark-side is real and tested: the schema contract, the
Arrow-batched ``mapInPandas`` signature, batch shapes, and partition
behavior.  Swapping a real decoder in (PIL/torchaudio/ffmpeg) changes one
dict entry, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of ``extract_features`` — fixed contract
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.IntegerType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_image_decode(payload: bytes) -> list[float]:
    """Deterministic fake 'decode': folds the byte histogram into
    FEATURE_DIM buckets (numpy-vectorized — a pure-Python per-byte loop
    dominated the batch time).  Replace with a real decoder when codecs
    exist."""
    import numpy as np

    if payload is None:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
    total = max(len(payload), 1)
    return (buckets / total).tolist()


def _unsupported(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "no codec available in this environment — plug a real decoder into "
        "FAKE_DECODERS (audio: torchaudio/soundfile, video: ffmpeg frame sample)"
    )


FAKE_DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _fake_image_decode,
    "audio": _unsupported,
    "video": _unsupported,
}


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """binary payload -> (metadata, feature vector) via Arrow-batched
    ``mapInPandas``.

    The per-batch loop touches each payload exactly once; batch size is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so large
    blobs don't blow executor memory.  Pure per-row map — preserves
    partitioning, no shuffle.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf[id_col],
                "media_type": pdf[type_col],
                "byte_size": pdf[payload_col].map(
                    lambda p: 0 if p is None else len(p)
                ),
                "content_sha256": pdf[payload_col].map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()
                ),
                "feature": [
                    FAKE_DECODERS[t](p)
                    for t, p in zip(pdf[type_col], pdf[payload_col])
                ],
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/benches: treat document text bytes as an opaque
    'image' payload so the binary plumbing can be exercised without real
    media files."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def resize_media(
    media: DataFrame, target_bytes: int, payload_col: str = "payload"
) -> DataFrame:
    """'Resize' each payload to at most ``target_bytes`` (deterministic
    byte crop — the stand-in for a real image resize; the env has no
    codecs).  The Spark-side plumbing is the real contract: binary in /
    binary out through an Arrow batch, per-row map, no shuffle, schema
    preserved.  Byte semantics are engine-reproducible (= SQL
    ``substring(payload, 1, n)``), so the gate query hash-checks it."""

    def crop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = pdf[payload_col].map(
                lambda p: None if p is None else p[:target_bytes]
            )
            yield pdf

    return media.mapInPandas(crop, schema=media.schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    num_frames: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample ``num_frames`` evenly-spaced 'frames' from each payload —
    the video-frame-sampling shape: a 1-to-N Arrow map (each input row
    yields up to ``num_frames`` frame rows).  Frame i covers bytes
    [i*stride, (i+1)*stride) with stride = max(len // num_frames, 1);
    offsets beyond the payload produce no row.  Deterministic byte
    slicing (= SQL substring), so the plumbing is oracle-checkable; a
    real ffmpeg sampler swaps into the same signature."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None or len(p) == 0:
                    continue
                stride = max(len(p) // num_frames, 1)
                for i in range(num_frames):
                    off = i * stride
                    if off >= len(p):
                        break
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(p[off : off + stride])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": payloads}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def resize_and_sample_frames(
    media: DataFrame,
    target_bytes: int,
    num_frames: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Fused resize → frame-sample in ONE Arrow pass.

    Chaining ``resize_media`` then ``sample_frames`` costs two
    ``mapInPandas`` stages = two Python-worker fleets and an extra
    Arrow serialize/deserialize of every (large, binary) payload — the
    measured worst throttling victim on the media path (docs/NOTES_r2.md).
    The crop is a cheap per-row slice, so it fuses into the frame loop for
    free: one Python stage, payload bytes cross the JVM↔Arrow boundary
    once.  Byte semantics identical to the chained form (gate-verified)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                p = p[:target_bytes]
                if len(p) == 0:
                    continue
                stride = max(len(p) // num_frames, 1)
                for i in range(num_frames):
                    off = i * stride
                    if off >= len(p):
                        break
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(p[off : off + stride])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": payloads}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)
