"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: media travels as a ``binary`` column plus a metadata struct
(modality, n_bytes, content_md5). Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each Python worker sees whole batches —
the Spark-side plumbing (schema, partitioning, batch shape) is real and
tested; the actual image/audio decoding is STUBBED (the container has no
PIL/ffmpeg) behind ``decode_media``, with a deterministic fake used by the
feature extractor so results are reproducible.

At 100 TB: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` down (or store media in sidecar
object storage and carry references) so a partition of decoded batches
fits executor memory; feature extraction is embarrassingly parallel with
zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, first_byte int, "
    "byte_sum_mod int, fake_width int, fake_height int"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct.

    Real pipelines read payloads from parquet binary columns; the metadata
    shape (modality/n_bytes/content_md5) is the contract downstream
    operators rely on.
    """
    payload = F.col(text_col).cast("binary")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_media(payload: bytes, modality: str):  # pragma: no cover - stub
    """Decode a media payload into a numpy array.

    STUB: real decoders (PIL / soundfile / av) are not installed in this
    environment. The plumbing around this function is real; swap this body
    for the actual decoder in production.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decoding requires PIL/soundfile/av which are not available; "
            "feature extraction uses the deterministic fake instead"
        ) from exc
    raise NotImplementedError("real decode path not implemented in this container")


def _fake_features(payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in for decode+feature-extract (see decode_media)."""
    n = len(payload)
    first = payload[0] if n else -1
    byte_sum = sum(payload[:16]) % 997
    return n, first, byte_sum, n % 64 + 1, n % 48 + 1


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps whole Arrow batches in the Python worker —
    the shape a real decoder needs (decode per element, vectorized
    post-processing per batch). Zero shuffle; scales with input splits.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "byte_sum_mod": [f[2] for f in feats],
                    "fake_width": [f[3] for f in feats],
                    "fake_height": [f[4] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize plumbing: one output payload per input, fixed target shape.

    The deterministic fake "resamples" the payload to width*height bytes by
    striding (real path: decode_media -> PIL resize -> re-encode). Output
    carries the target dims + resized payload — the schema a thumbnailing
    stage hands to training-data writers.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) >= target:
                    step = len(b) // target
                    out.append(bytes(b[i * step] for i in range(target)))
                else:  # pad by cycling
                    out.append((b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": width,
                    "height": height,
                    "thumb": out,
                }
            )

    return media.mapInPandas(run, schema="doc_id long, width int, height int, thumb binary")


def sample_frames(media: DataFrame, frame_bytes: int = 64, every: int = 3) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into fixed-size frames,
    keep every ``every``-th (video-keyframe shape: one input row fans out to
    N output rows inside the Python worker, still zero shuffle).

    Emits (doc_id, frame_idx, frame_md5) — md5 instead of raw bytes so the
    result is oracle-checkable.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(hashlib.md5(b[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": sums})

    return media.mapInPandas(run, schema="doc_id long, frame_idx long, frame_md5 string")
