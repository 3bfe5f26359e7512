"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as binary columns with metadata
structs; decode/feature-extraction runs as Arrow-batched Pandas UDFs over
mapInPandas. Two decode modes share identical Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape):

- ``decode_mode="fake"``: deterministic pseudo-features straight from
  the payload bytes — library-free, oracle-checkable (X09).
- ``decode_mode="real"``: actual decoding via operators/codecs.py —
  pure-Python BMP (24-bpp BI_RGB) and WAV (RIFF PCM16) decoders, no
  native libraries needed (X55 oracle-checks this path end-to-end).
  Compressed formats (JPEG/PNG/MP3/video) still require PIL/ffmpeg,
  which this container lacks — those payloads raise ValueError at the
  codec boundary, not a stubbed NotImplementedError.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators import codecs

#: Output schema of extract_features — typed metadata + a small feature vec.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, n_frames long, features array<double>"
)

_MODES = ("fake", "real")


def _check_mode(decode_mode: str) -> None:
    if decode_mode not in _MODES:
        raise ValueError(f"decode_mode must be fake|real, got {decode_mode}")


def attach_binary(
    docs: DataFrame, text_col: str = "text", codec: str = "bytes"
) -> DataFrame:
    """Simulate a multimodal table from the documents fixture.

    codec="bytes": payload = utf-8 bytes of the text (opaque stand-in,
    pure JVM projection). codec="bmp": payload = a real 8×8 grayscale
    24-bpp BMP whose pixels are the first 64 text bytes (zero-padded) —
    decodable by decode_mode="real". codec="wav": payload = a real
    PCM16 WAV whose samples are the text bytes. The encoded variants run
    through mapInPandas (numpy per batch), 1:1 rows, no shuffle.
    """
    if codec == "bytes":
        payload = F.encode(F.col(text_col), "utf-8")
        return docs.select(
            "doc_id",
            payload.alias("payload"),
            F.struct(
                F.length(payload).cast("long").alias("n_bytes"),
                F.lit("application/octet-stream").alias("mime"),
            ).alias("meta"),
        )
    if codec not in ("bmp", "wav"):
        raise ValueError(f"codec must be bytes|bmp|wav, got {codec}")
    mime = "image/bmp" if codec == "bmp" else "audio/wav"

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                b = (text or "").encode("utf-8")
                if codec == "bmp":
                    px = np.zeros(64, dtype=np.uint8)
                    arr = np.frombuffer(b[:64], dtype=np.uint8)
                    px[: len(arr)] = arr
                    payloads.append(codecs.encode_bmp(px.reshape(8, 8)))
                else:
                    samples = np.frombuffer(b, dtype=np.uint8).astype("<i2")
                    payloads.append(codecs.encode_wav(samples))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )
            yield out

    enc = docs.select("doc_id", text_col).mapInPandas(
        _encode, schema="doc_id long, payload binary, n_bytes long"
    )
    return enc.select(
        "doc_id",
        "payload",
        F.struct(F.col("n_bytes"), F.lit(mime).alias("mime")).alias("meta"),
    )


def _decode_values(b: bytes):
    """payload → (flat numeric array for features, n_frames). BMP: pixel
    channel bytes, one frame. WAV: int16 samples, one frame per sample."""
    import numpy as np

    kind = codecs.sniff(b)
    if kind == "bmp":
        px = codecs.decode_bmp(b)
        return px.reshape(-1).astype(np.float64), 1, px.shape[0] * px.shape[1]
    if kind == "wav":
        _, samples = codecs.decode_wav(b)
        vals = samples.astype(np.float64)
        return vals, len(samples), len(samples)
    raise ValueError(
        "unsupported payload format for decode_mode='real' (pure-Python "
        "codecs cover BMP/WAV; compressed formats need PIL/ffmpeg)"
    )


def extract_features(
    media: DataFrame,
    decode_mode: str = "fake",
    frame_bytes: int = 1000,
    n_features: int = 4,
) -> DataFrame:
    """Decode / feature-extract over mapInPandas (Arrow batches).

    fake mode (deterministic, library-free): n_frames = n_bytes //
    frame_bytes + 1 (frame-sampling stand-in), features = mean/min/max
    of the byte values + byte count. real mode decodes BMP/WAV via
    operators/codecs.py: features = mean/min/max over pixel channel
    bytes (images) or int16 samples (audio) + pixel/sample count —
    mean/min/max agree with the grayscale source values, which is what
    X55's oracle pins.
    """
    _check_mode(decode_mode)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if decode_mode == "real":
                    vals, n_frames, count = _decode_values(b)
                    feats = [
                        float(vals.mean()) if count else 0.0,
                        float(vals.min()) if count else 0.0,
                        float(vals.max()) if count else 0.0,
                        float(count),
                    ][:n_features]
                    rows.append((doc_id, n, n_frames, feats))
                else:
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
    output). fake mode: L2-normalized histogram of the raw payload bytes
    folded to `dim` buckets. real mode: the same histogram over DECODED
    content (pixel channel bytes / |samples| mod dim) — deterministic,
    numpy per Arrow batch, exactly where a CLIP/encoder forward pass
    would slot in."""
    _check_mode(decode_mode)

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if decode_mode == "real":
                    vals, _, _ = _decode_values(b)
                    arr = np.abs(vals).astype(np.int64)
                else:
                    arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                n = np.linalg.norm(hist)
                out.append((hist / n if n else hist).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": out})

    return media.mapInPandas(_embed, schema=EMBED_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    decode_mode: str = "fake",
) -> DataFrame:
    """Resize over mapInPandas: binary in → binary out with typed
    dimensions. fake mode deterministically resamples the byte stream to
    width·height bytes (nearest-neighbour over byte offsets). real mode
    decodes BMP, nearest-neighbour-resamples the pixel grid with numpy
    indexing, and re-encodes BMP (audio payloads raise — resize is an
    image operation). Output rows stay 1:1 with input — partitioning is
    preserved, no shuffle."""
    _check_mode(decode_mode)
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if decode_mode == "real":
                    px = codecs.decode_bmp(b)  # raises on non-BMP
                    h, w = px.shape[:2]
                    ri = (np.arange(height) * h) // height
                    ci = (np.arange(width) * w) // width
                    out = codecs.encode_bmp(px[ri][:, ci])
                elif b:
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
    """Frame sampling: one input row fans out to one row per sampled
    frame (the 1→N Arrow batch shape a keyframe extractor has). fake
    mode slices the payload into frame_bytes-sized chunks and keeps
    every `every_nth`. real mode: WAV → frame_bytes-sized blocks of the
    DECODED PCM byte stream (every_nth kept); BMP → the single image as
    frame 0 (a still has one frame)."""
    _check_mode(decode_mode)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if decode_mode == "real":
                    kind = codecs.sniff(b)
                    if kind == "bmp":
                        rows.append((doc_id, 0, b))
                        continue
                    _, samples = codecs.decode_wav(b)  # raises on unknown
                    b = samples.astype("<i2").tobytes()
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for k in range(0, n_frames, every_nth):
                    rows.append(
                        (doc_id, k, b[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis (pure numpy, deterministic)."""
    import numpy as np

    k = np.arange(n)
    C = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C *= np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C


def _pool_gray(px, n: int = 8):
    """Area-style downsample of a grayscale image to n×n by block
    means over near-equal index segments (any input size ≥ 1 works;
    an n×n input passes through unchanged). The classic pHash recipe
    downsamples before the DCT — without this, any non-fixture image
    size would crash the matmul."""
    import numpy as np

    h, w = px.shape
    if (h, w) == (n, n):
        return px
    rb = np.linspace(0, h, n + 1).round().astype(int)
    cb = np.linspace(0, w, n + 1).round().astype(int)
    out = np.empty((n, n), dtype=float)
    for i in range(n):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        for j in range(n):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            out[i, j] = px[min(r0, h - 1) : min(r1, h), min(c0, w - 1) : min(c1, w)].mean()
    return out


def phash(
    media: DataFrame,
    decode_mode: str = "real",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual image hash (the classic pHash recipe: grayscale → 2D
    DCT-II → threshold the AC coefficients at their median → 64-bit
    hash). Robust to brightness shifts and small pixel noise — the
    image-dedup key, the visual analogue of SimHash for text. Decode +
    DCT run vectorized per Arrow batch through the same codec seam as
    extract_features; ``decode_mode="fake"`` hashes deterministic
    pseudo-pixels from the payload bytes so the plumbing is testable
    without real images. Returns ``(id_col, phash)`` with phash a
    64-bit long.
    """
    _check_mode(decode_mode)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        C = _dct_matrix(8)
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                b = bytes(b)
                if decode_mode == "real":
                    px = codecs.decode_bmp(b).astype(float).mean(axis=2)
                else:
                    raw = np.frombuffer(b[:64].ljust(64, b"\0"), dtype=np.uint8)
                    px = raw.astype(float).reshape(8, 8)
                px = _pool_gray(px, 8)
                d = C @ px @ C.T
                ac = d.flatten()[1:]  # drop the DC coefficient
                bits = ac > np.median(ac)
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                # 63 bits → fits a signed long without wrap
                out.append(h)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": out})

    return media.select(id_col, payload_col).mapInPandas(
        _hash, schema=f"{id_col} long, phash long"
    )


def phash_near_dups(
    media: DataFrame,
    max_hamming: int = 3,
    decode_mode: str = "real",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate images by pHash Hamming distance ≤ ``max_hamming``
    via pigeonhole banding: the 63-bit hash splits into
    ``max_hamming + 1`` bands, and any pair within the distance budget
    must agree on ≥ 1 whole band (pigeonhole) — so candidates come from
    per-band equality joins, never an all-pairs scan, exactly the
    SimHash banding argument. Exact Hamming (``bit_count(xor)``, pure
    codegen) filters candidates. Returns ``(i, j, hamming)`` with
    i < j."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    h = phash(media, decode_mode, id_col, payload_col)
    bands = h.select(
        F.col(id_col).alias("d"),
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.call_function(
                            "shiftright", F.col("phash"), F.lit(i * width)
                        )
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("d", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.select(
        F.col("d").alias("i"), F.col("phash").alias("ph_i"), "band", "val"
    )
    b = bands.select(
        F.col("d").alias("j"), F.col("phash").alias("ph_j"), "band", "val"
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", "ph_i", "ph_j")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.call_function(
                "bit_count",
                F.col("ph_i").bitwiseXOR(F.col("ph_j")),
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )


def audio_fingerprint(
    media: DataFrame,
    frame: int = 64,
    hop: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Spectral-peak audio fingerprints — the constellation idea behind
    Shazam (Wang 2003, "An Industrial-Strength Audio Search Algorithm"),
    reduced to its dedup core: frame the PCM signal, take each frame's
    rFFT magnitude spectrum, keep the two strongest non-DC bins, and
    hash the (bin1, bin2) pair. A document's fingerprint is its DISTINCT
    frame-hash set — invariant to amplitude scaling by construction
    (the FFT is linear, argmax doesn't move; property-tested), the
    audio analogue of winnowing fingerprints. Decode + FFT run
    vectorized per Arrow batch over the real WAV codec (operators/
    codecs.py). Returns ``(id_col, fp)`` exploded, one row per distinct
    frame hash."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fps = [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                _, samples = codecs.decode_wav(bytes(b))
                samples = samples.astype(float)
                n_frames = max(0, (len(samples) - frame) // hop + 1)
                seen = set()
                for i in range(n_frames):
                    win = samples[i * hop : i * hop + frame]
                    mag = np.abs(np.fft.rfft(win))
                    mag[0] = 0.0  # DC carries offset, not content
                    top = np.argsort(-mag, kind="stable")[:2]
                    seen.add(int(top[0]) * 256 + int(top[1]))
                ids.extend([doc_id] * len(seen))
                fps.extend(sorted(seen))
            yield pd.DataFrame({id_col: ids, "fp": fps})

    return media.select(id_col, payload_col).mapInPandas(
        _fp, schema=f"{id_col} long, fp long"
    )


def audio_near_dups(
    media: DataFrame,
    min_shared: int = 4,
    max_doc_freq: int = 50,
    frame: int = 64,
    hop: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate audio by shared spectral fingerprints: pairs
    sharing ≥ ``min_shared`` distinct frame hashes, with the same
    stop-fingerprint doc-frequency cap as winnow_near_dups (a ubiquitous
    spectral pair would otherwise join every pair of a large corpus).
    Returns ``(i, j, n_shared)`` with i < j."""
    fp = audio_fingerprint(media, frame, hop, id_col, payload_col).select(
        F.col(id_col).alias("d"), "fp"
    )
    freq = fp.groupBy("fp").agg(F.count("*").alias("nd"))
    rare = fp.join(
        freq.filter(F.col("nd") <= max_doc_freq).select("fp"), "fp", "left_semi"
    )
    a = rare.select(F.col("d").alias("i"), "fp")
    b = rare.select(F.col("d").alias("j"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def audio_energy_segments(
    media: DataFrame,
    frame: int = 64,
    hop: int = 64,
    threshold_db: float = -30.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-based activity segmentation — the VAD-shaped front end of
    an audio-corpus pipeline (trim silence, split long recordings into
    voiced chunks before feature extraction). Frames the PCM signal,
    computes per-frame RMS in dB relative to int16 full scale, marks
    frames above ``threshold_db``, and merges RUNS of consecutive
    active frames into segments.

    Decode + framing run vectorized per Arrow batch over the real WAV
    codec (operators/codecs.py); the run-merge is a tiny per-document
    numpy pass over its own frame mask (never cross-document state), so
    the operator is embarrassingly parallel and linear in audio bytes.

    Output: (id_col, seg_id, start_ms, end_ms, peak_db) — end exclusive,
    times from the sample rate in each WAV header.
    """

    def _seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, sids, starts, ends, peaks = [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                rate, samples = codecs.decode_wav(bytes(b))
                x = samples.astype(float) / 32768.0
                n_frames = max(0, (len(x) - frame) // hop + 1)
                if n_frames == 0:
                    continue
                idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)
                frames = x[idx]
                rms = np.sqrt((frames * frames).mean(axis=1))
                db = 20.0 * np.log10(np.maximum(rms, 1e-10))
                active = db > threshold_db
                # run boundaries from the diff of the padded mask
                padded = np.concatenate([[False], active, [False]])
                edges = np.flatnonzero(padded[1:] != padded[:-1])
                seg_id = 0
                for s, e in zip(edges[::2], edges[1::2]):
                    ids.append(doc_id)
                    sids.append(seg_id)
                    starts.append(int(s * hop * 1000 / rate))
                    ends.append(int(((e - 1) * hop + frame) * 1000 / rate))
                    peaks.append(float(np.round(db[s:e].max(), 2)))
                    seg_id += 1
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "seg_id": pd.Series(sids, dtype="int64"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "end_ms": pd.Series(ends, dtype="int64"),
                    "peak_db": pd.Series(peaks, dtype="float64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        _seg,
        schema=f"{id_col} long, seg_id long, start_ms long, end_ms long, peak_db double",
    )
