"""Multimodal column plumbing (SURVEY.md north star): image/audio/video
as opaque ``binary`` columns + typed metadata, with decode/feature-
extract as Arrow-batched mapInPandas kernels.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (byte-level features standing in for pixel/sample
features) — clearly marked below. Everything around it — schema,
partitioning, Arrow batch shape, UDF signature — is the real 100 TB
plumbing: binary payloads never leave the executor, features are
computed batch-wise, and the output schema is fixed up front.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "byte_mean double, byte_entropy double, feature array<double>"
)


def _r4(x: float) -> float:
    """Round half AWAY FROM ZERO at 4 digits — the engine-wide
    convention (Spark round / DuckDB round). Python's built-in round
    is half-to-even and disagrees exactly on the .xxxx5 grid points an
    integer-sum mean can land on."""
    import math

    return math.floor(abs(x) * 1e4 + 0.5) / 1e4 * (1 if x >= 0 else -1)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Testbed adapter: materialize an opaque binary column from text
    (stands in for an image/audio payload) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decode: a real deployment would dispatch on media_type to
    PIL/libsndfile/pyav here. Deterministic byte-view instead — the
    Spark-side contract (bytes in, fixed-length feature out) is real."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)


def extract_features(media: DataFrame, feat_dim: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch is decoded and reduced to fixed-length
    features without any per-row Python dispatch overhead beyond the
    batch loop; payload bytes stay executor-local."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                batch["doc_id"], batch["payload"], batch["media_type"]
            ):
                arr = _decode_stub(payload, mtype)
                n = len(arr)
                if n == 0:
                    # no bytes -> no features row (undecodable/empty
                    # media is filtered, not zero-filled)
                    continue
                hist = np.bincount(arr.astype(np.int64) % 256, minlength=256) / n
                nz = hist[hist > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                # fixed-length "feature": mean of feat_dim equal chunks
                chunks = np.array_split(arr, feat_dim)
                feat = [_r4(float(c.mean())) if len(c) else 0.0 for c in chunks]
                rows.append(
                    (doc_id, mtype, n, _r4(float(arr.mean())), _r4(entropy), feat)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "byte_mean",
                    "byte_entropy",
                    "feature",
                ],
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, media_type string, frame_idx int, n_bytes long, "
    "frame_mean double, frame_std double"
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one payload row -> ``n_frames`` frame rows (the
    video keyframe-extraction shape). DECODE is the deterministic stub
    (equal byte segments stand in for decoded frames — a real
    deployment dispatches to pyav/ffmpeg here); the one-to-many Arrow
    batch shape, fixed output schema, and executor-local payload
    handling are the real plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                batch["doc_id"], batch["payload"], batch["media_type"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                n = len(arr)
                for f in range(n_frames):
                    seg = arr[f * n // n_frames : (f + 1) * n // n_frames]
                    if len(seg) == 0:
                        # a payload shorter than n_frames bytes yields
                        # fewer frames, not zero-filled phantom rows
                        # (matches the oracle's positional segmentation)
                        continue
                    rows.append(
                        (
                            doc_id,
                            mtype,
                            f,
                            len(seg),
                            _r4(float(seg.mean())),
                            _r4(float(seg.std())),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "frame_idx",
                    "n_bytes",
                    "frame_mean",
                    "frame_std",
                ],
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, bucket int, "
    "pooled long, n_in_bucket long"
)


def resize_media(media: DataFrame, target: int = 16) -> DataFrame:
    """Resize / downsample: average-pool each decoded payload into
    ``target`` buckets — the image-resize / audio-downsample step of a
    multimodal pipeline, with the decode stub standing in for the
    pixel/sample decode (a real deployment dispatches to PIL/libsndfile
    here; the Arrow batch shape, the one-to-many output, and the
    executor-local pooling are the real plumbing).

    Bucket assignment is the closed-form integer map
    ``bucket = (pos * target) div n_bytes`` (0-based pos) — exactly
    restatable in SQL, unlike boundary-list schemes that need an
    inverse search. Pooled values are truncating integer means
    (sum div count), so every output column is an exact integer and
    the whole kernel hash-checks cross-engine. Payloads shorter than
    ``target`` bytes hit only a subset of buckets (the same formula on
    both sides); empty payloads emit no rows.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload, mtype in zip(
                batch["doc_id"], batch["payload"], batch["media_type"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                if n == 0:
                    continue
                buckets = (np.arange(n, dtype=np.int64) * target) // n
                sums = np.bincount(buckets, weights=arr, minlength=0).astype(np.int64)
                counts = np.bincount(buckets, minlength=0).astype(np.int64)
                for b in np.nonzero(counts)[0]:
                    rows.append(
                        (
                            doc_id,
                            mtype,
                            n,
                            int(b),
                            int(sums[b] // counts[b]),
                            int(counts[b]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "bucket",
                    "pooled",
                    "n_in_bucket",
                ],
            )

    return media.mapInPandas(kernel, RESIZE_SCHEMA)
