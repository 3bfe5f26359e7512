"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as binary columns with metadata
structs; decode/feature-extraction runs as Arrow-batched Pandas UDFs over
mapInPandas. The image/audio decode libraries are NOT available in this
environment, so the decode step is stubbed: ``decode_mode="fake"`` derives
deterministic pseudo-features from the bytes (testable plumbing);
``decode_mode="real"`` raises NotImplementedError where a PIL/ffmpeg call
would go. The Spark-side contract — schema, partitioning, UDF signature,
Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_features — typed metadata + a small feature vec.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, n_frames long, features array<double>"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), plus a typed metadata struct."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    decode_mode: str = "fake",
    frame_bytes: int = 1000,
    n_features: int = 4,
) -> DataFrame:
    """Decode / feature-extract over mapInPandas (Arrow batches).

    fake mode (deterministic, library-free): n_frames = ceil-ish frame
    count (n_bytes // frame_bytes + 1 — frame sampling stand-in), features
    = mean/min/max/len of the byte values. real mode raises — this
    container has no image/audio codecs (see module docstring).
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be fake|real, got {decode_mode}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real decode needs PIL/ffmpeg — not available in this "
                    "container; use decode_mode='fake' for plumbing tests"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                feats = [
                    float(sum(b)) / n if n else 0.0,
                    float(min(b)) if n else 0.0,
                    float(max(b)) if n else 0.0,
                    float(n),
                ][:n_features]
                rows.append((doc_id, n, n // frame_bytes + 1, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "n_frames", "features"]
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


EMBED_SCHEMA = "doc_id long, embedding array<float>"


def embed_media(
    media: DataFrame, dim: int = 64, decode_mode: str = "fake"
) -> DataFrame:
    """Media → embedding column, the input shape of the similarity stack
    (cosine_topk / ann_topk / cosine_near_dups run unchanged on the
    output). fake mode: L2-normalized byte-value histogram folded to
    `dim` buckets — deterministic, vectorized with numpy per Arrow batch,
    exactly where a CLIP/encoder forward pass would slot in; real mode
    raises (no model runtimes in this container)."""
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be fake|real, got {decode_mode}")

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real embedding needs a model runtime — not available "
                    "in this container; use decode_mode='fake'"
                )
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                n = np.linalg.norm(hist)
                out.append((hist / n if n else hist).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "embedding": out}
            )

    return media.mapInPandas(_embed, schema=EMBED_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    decode_mode: str = "fake",
) -> DataFrame:
    """Resize stub over mapInPandas: binary in → binary out with typed
    dimensions. fake mode deterministically resamples the byte stream to
    width·height bytes (nearest-neighbour over byte offsets — the exact
    shape a PIL `Image.resize` integration would have); real mode raises
    (no codecs in this container). Output rows stay 1:1 with input —
    partitioning is preserved, no shuffle."""
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be fake|real, got {decode_mode}")
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real resize needs PIL — not available in this container"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b:
                    out = bytes(b[(i * len(b)) // target] for i in range(target))
                else:
                    out = b"\x00" * target
                rows.append((doc_id, out, width, height))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "width", "height"]
            )

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame binary"


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 1000,
    every_nth: int = 2,
    decode_mode: str = "fake",
) -> DataFrame:
    """Frame-sampling stub: one input row fans out to one row per sampled
    frame (the 1→N Arrow batch shape an ffmpeg keyframe extractor would
    have). fake mode slices the payload into frame_bytes-sized chunks and
    keeps every `every_nth`; real mode raises."""
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be fake|real, got {decode_mode}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real frame extraction needs ffmpeg — not available "
                    "in this container"
                )
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, every_nth):
                    rows.append(
                        (doc_id, k, b[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)
