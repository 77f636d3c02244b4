"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media alongside text. The engine treats
media as `payload: binary` columns with a `media_type` discriminator and
typed metadata, and runs decode / feature-extract / resize / frame-sample
as Arrow-batched pandas UDFs over mapInPandas — the same "Python only at
vectorized boundaries" rule as the text signature stage.

Decode is STUBBED in this environment: no image/audio libs are installed
(PIL/cv2/librosa absent), so `decode_image` raises NotImplementedError
unless PIL is importable, and the feature extractors below use a
deterministic byte-level fake (content-hash features + byte histograms)
so that the Spark-side plumbing — schema, partitioning, UDF signatures,
Arrow batch shapes — is real and fully tested. Swapping the fake for a
real decoder changes ONE function body, no plan shape.

Schema contract:
    media(doc_id long, media_type string, payload binary,
          meta map<string,string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - env-gated
    """Real image decode — unavailable in this container (no PIL/cv2).

    The feature extractors below use `_fake_decode_features` instead;
    this function is the single swap point for a real deployment.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL/cv2, not installed in this "
            "environment; extract_media_features uses the deterministic "
            "byte-level stand-in instead"
        )
    import io

    return Image.open(io.BytesIO(payload))


def _fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decoded-media embedding:
    L1-normalized byte histogram folded to `dim` buckets. Pure function
    of the payload bytes — stable across runs/executors/partitionings."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media -> (doc_id, media_type, n_bytes, content_sha1, feature).

    One Arrow batch at a time; per-batch numpy. The sha1 is the
    media-dedup key (exact); the feature vector feeds the embedding
    near-dup path (operators.dedup.embedding_near_dup_pairs).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, sha, feats = [], [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                n_bytes.append(len(b))
                sha.append(hashlib.sha1(b).hexdigest())
                feats.append(_fake_decode_features(b, dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(n_bytes, dtype="int64"),
                    "content_sha1": sha,
                    "feature": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        compute, FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha1", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, chunk: int = 4096
) -> DataFrame:
    """Video frame sampling, stubbed at the byte level: split the payload
    into fixed `chunk` windows at n_frames evenly-spaced offsets ("frames")
    and fingerprint each — the real implementation swaps the byte window
    for an actual decoded frame; plan shape (one media row -> n_frames
    rows, Arrow-batched) is identical.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if not b:
                    continue
                offsets = np.linspace(
                    0, max(len(b) - chunk, 0), n_frames, dtype=np.int64
                )
                for i, off in enumerate(offsets):
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha1(b[off : off + chunk]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_sha1": shas,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(compute, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes_in", T.LongType(), False),
        T.StructField("n_bytes_out", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), False),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 1024) -> DataFrame:
    """Media resize, stubbed at the byte level: deterministic stride
    subsampling of the payload to ~target_bytes (the real implementation
    swaps the byte stride for an image resample — PIL absent in this
    container; single swap point like decode_image). Plan shape (one
    Arrow-batched mapInPandas pass, binary in → binary out, bounded
    output row size) is the real contract and is what scales: output is
    capped at target_bytes per row regardless of input size.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_in, n_out, out = [], [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                n_in.append(len(b))
                if len(b) <= target_bytes:
                    r = b
                else:
                    step = -(-len(b) // target_bytes)  # ceil div
                    r = b[::step][:target_bytes]
                n_out.append(len(r))
                out.append(r)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_in": pd.array(n_in, dtype="int64"),
                    "n_bytes_out": pd.array(n_out, dtype="int64"),
                    "resized": out,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(compute, RESIZE_SCHEMA)


def exact_media_dup_groups(features: DataFrame) -> DataFrame:
    """Byte-identical media groups by content sha1 (exact media dedup)."""
    from pyspark.sql import functions as F

    return (
        features.groupBy("content_sha1")
        .agg(
            F.count("*").alias("n_media"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_media") > 1)
    )
