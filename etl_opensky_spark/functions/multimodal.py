"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

IMAGE and AUDIO decode are REAL in every environment:
``with_available_codecs()`` registers the pure-stdlib PNG decoder
(``functions.png`` — zlib inflate + unfilter, oracle-gated in q291)
and the pure-stdlib PCM WAV decoder (``functions.wav`` — stdlib
``wave`` framing + numpy sample conversion, oracle-gated in q312),
with Pillow/soundfile overriding them where importable.  Video decode
still needs a codec library the container lacks, so it stays behind
the deterministic-fake / ``NotImplementedError`` guard — while
everything Spark-side is real and tested: the schema contract, the
Arrow-batched ``mapInPandas`` signature, batch shapes, and partition
behavior.

Decoder injection is official API: :class:`DecoderRegistry` maps
``media_type -> decoder``; ``extract_features(..., registry=...)``
carries it into the Arrow closure, and ``with_available_codecs()``
upgrades a copy with a real decoder per importable codec library
(Pillow, soundfile) — so real codecs drop in without touching the plan.
``FAKE_DECODERS`` remains as the dict backing ``DEFAULT_REGISTRY``.
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


class DecoderRegistry:
    """Official decoder-injection seam (the contract a real Pillow/
    torchaudio/ffmpeg decoder drops into without touching the Arrow
    plumbing): ``media_type -> decoder(bytes | None) -> list[float]`` of
    length ``FEATURE_DIM``.

    A registry instance rides inside the ``mapInPandas`` closure, so
    decoders must be module-level callables (picklable) — no lambdas
    capturing live handles; open codec contexts lazily inside the
    decoder.  ``DEFAULT_REGISTRY`` is backed by the module's
    ``FAKE_DECODERS`` dict (the historical seam — mutating that dict
    still works), with deterministic fakes for image and
    ``NotImplementedError`` guards for audio/video because this
    container has no codecs.  ``with_available_codecs()`` upgrades a
    copy with a real decoder for every importable codec library and is
    a no-op here (tests for real codecs are import-skipped).
    """

    def __init__(
        self, decoders: dict[str, Callable[[bytes], list[float]]] | None = None
    ):
        self._decoders = decoders if decoders is not None else {}

    def register(
        self, media_type: str, decoder: Callable[[bytes], list[float]]
    ) -> "DecoderRegistry":
        """Bind ``decoder`` to ``media_type`` in place; returns self."""
        self._decoders[media_type] = decoder
        return self

    def copy(self) -> "DecoderRegistry":
        return DecoderRegistry(dict(self._decoders))

    def decode(self, media_type: str, payload: bytes | None) -> list[float]:
        try:
            decoder = self._decoders[media_type]
        except KeyError:
            raise KeyError(
                f"no decoder registered for media_type={media_type!r}; "
                f"known: {sorted(self._decoders)}"
            ) from None
        return decoder(payload)

    def media_types(self) -> list[str]:
        return sorted(self._decoders)


#: default registry — SHARES the FAKE_DECODERS dict so the pre-registry
#: injection seam (mutating FAKE_DECODERS) keeps working unchanged
DEFAULT_REGISTRY = DecoderRegistry(FAKE_DECODERS)


def _pil_image_decode(payload: bytes) -> list[float]:
    """Real image decode (requires Pillow): grayscale-decode, resize to
    FEATURE_DIM×1, normalize to [0, 1]."""
    import io

    import numpy as np
    from PIL import Image  # gated: only reachable via with_available_codecs

    if payload is None:
        return [0.0] * FEATURE_DIM
    img = Image.open(io.BytesIO(payload)).convert("L").resize((FEATURE_DIM, 1))
    return (np.asarray(img, dtype=np.float64).reshape(-1) / 255.0).tolist()


def _soundfile_audio_decode(payload: bytes) -> list[float]:
    """Real audio decode (requires soundfile): FEATURE_DIM mean-absolute
    amplitude buckets over the first channel."""
    import io

    import numpy as np
    import soundfile  # gated: only reachable via with_available_codecs

    if payload is None:
        return [0.0] * FEATURE_DIM
    data, _rate = soundfile.read(io.BytesIO(payload), always_2d=True)
    mono = np.abs(data[:, 0])
    n = max(len(mono) // FEATURE_DIM, 1)
    out = [float(mono[i * n : (i + 1) * n].mean()) if len(mono[i * n : (i + 1) * n]) else 0.0
           for i in range(FEATURE_DIM)]
    return out


def with_available_codecs(
    registry: DecoderRegistry | None = None,
) -> DecoderRegistry:
    """Copy of ``registry`` (default: DEFAULT_REGISTRY) upgraded with a
    real decoder for every codec library importable in this environment
    (Pillow → image, soundfile → audio).  Images always get at least
    the pure-stdlib PNG decoder (``functions.png`` — zlib + unfilter,
    no codec library needed), audio at least the pure-stdlib PCM
    WAV decoder (``functions.wav`` — stdlib ``wave`` framing + numpy
    sample conversion), and video at least the pure-stdlib
    uncompressed-DIB AVI decoder (``functions.avi`` — RIFF walking +
    numpy frame de-padding; both round 11), so ALL THREE modalities
    are REAL in every container; Pillow/soundfile (and an ffmpeg
    binding, when one exists) override them with the multi-format
    paths."""
    reg = (registry or DEFAULT_REGISTRY).copy()
    from etl_opensky_spark.functions.avi import avi_video_decode
    from etl_opensky_spark.functions.png import png_image_decode
    from etl_opensky_spark.functions.wav import wav_audio_decode

    reg.register("image", png_image_decode)
    reg.register("audio", wav_audio_decode)
    reg.register("video", avi_video_decode)
    try:
        import PIL.Image  # noqa: F401

        reg.register("image", _pil_image_decode)
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401

        reg.register("audio", _soundfile_audio_decode)
    except ImportError:
        pass
    return reg


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    registry: DecoderRegistry | None = None,
) -> DataFrame:
    """binary payload -> (metadata, feature vector) via Arrow-batched
    ``mapInPandas``.

    The per-batch loop touches each payload exactly once; batch size is
    governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so large
    blobs don't blow executor memory.  Pure per-row map — preserves
    partitioning, no shuffle.

    ``registry``: a :class:`DecoderRegistry`; defaults to
    ``DEFAULT_REGISTRY`` (deterministic fakes in this env).  Pass
    ``with_available_codecs()`` to use real codecs where installed.
    """
    reg = registry if registry is not None else DEFAULT_REGISTRY

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
                    reg.decode(t, p)
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
