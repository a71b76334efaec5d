"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a ``binary``
column (or a reference to object storage) beside typed metadata
(modality/mime/width/…); run decode/feature-extraction as Arrow-batched
pandas functions via ``mapInPandas`` so each task processes a columnar
batch without JVM→Python row overhead.

The decode step itself needs codec libraries (PIL/ffmpeg) that are NOT in
this environment — it is STUBBED behind ``decode_image`` (raises
NotImplementedError) with a deterministic fake (byte-histogram features)
standing in, so the Spark-side plumbing — schema, batch iteration,
partitioning, UDF signature — is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo media table: utf-8 bytes of the text standing in for an image
    payload, with typed metadata — the schema a real ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real decode would go through PIL/libjpeg — unavailable here."""
    raise NotImplementedError(
        "image codecs not present in this environment; "
        "extract_features uses the deterministic byte-histogram fake"
    )


def _byte_histogram(payload: bytes, bins: int = 16) -> list[float]:
    """Deterministic fake feature extractor: normalized 16-bin byte histogram.

    Stands in for decode→resize→embed; same shape/contract as a real one.
    """
    if not payload:
        return [0.0] * bins
    counts = [0] * bins
    for b in payload:
        counts[b * bins // 256] += 1
    n = float(len(payload))
    return [c / n for c in counts]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize step (stubbed decode): a real implementation decodes with
    PIL/libjpeg and re-encodes; this deterministic fake downsamples the
    byte stream to width*height bytes so the batch shape, schema and
    size-reduction contract are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            def fake_resize(p: bytes) -> bytes:
                b = bytes(p)
                if len(b) <= target:
                    return b.ljust(target, b"\0")
                step = len(b) / target
                return bytes(b[int(i * step)] for i in range(target))

            out = pdf["payload"].map(lambda p: fake_resize(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "n_bytes": out.map(len),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_k: int = 4
) -> DataFrame:
    """Frame-sampling step for video-like payloads: split the byte stream
    into fixed-size 'frames' and keep every k-th — a fan-OUT mapInPandas
    (one input row → many frame rows), the shape a real ffmpeg-backed
    sampler would have. Decoding is stubbed (no codecs in this env)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            # column-wise zip, not iterrows — iterrows builds a pandas
            # Series per row and dominates the batch at ~50× the cost
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // frame_bytes, 1)
                for f in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(f)
                    frames.append(b[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each task receives an iterator of pandas batches —
    the scalable shape for per-item Python work (vs row-at-a-time UDFs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "features": pdf["payload"].map(
                        lambda p: _byte_histogram(bytes(p), bins)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
