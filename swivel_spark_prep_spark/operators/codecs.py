"""Pure-Python media codecs — the "real" decode path for multimodal.py.

This container has no PIL/ffmpeg, but two ubiquitous uncompressed
formats need neither: BMP (BITMAPINFOHEADER, 24-bpp BI_RGB) and WAV
(RIFF PCM16). Both are implemented here from the public format specs
with stdlib ``struct`` + numpy only, which graduates
``decode_mode="real"`` from a NotImplementedError seam to a working
decoder inside the existing mapInPandas plumbing. Compressed formats
(JPEG/PNG/MP3) still need external codecs and keep raising — that
boundary is documented per function.

Scale note: codecs are called per Arrow batch inside mapInPandas; all
pixel/sample math is numpy (no per-byte Python loops on the data path).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "sniff",
]

_BMP_HEADER = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def sniff(b: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' from magic bytes."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxW (grayscale, replicated to RGB) or HxWx3 uint8 → 24-bpp BI_RGB
    BMP bytes (bottom-up rows, 4-byte row padding — the format default)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxW or HxWx3, got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BMP stores rows bottom-up and channels as BGR; pad rows to 4 bytes
    bgr = arr[::-1, :, ::-1].reshape(h, row_bytes)
    if pad:
        bgr = np.concatenate(
            [bgr, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    body = bgr.tobytes()
    size = _BMP_HEADER + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + info + bytes(body)


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bpp BI_RGB BMP bytes → HxWx3 uint8 (RGB, top-down)."""
    if sniff(b) != "bmp":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bpp BMP supported (bpp={bpp}, "
            f"compression={compression}) — compressed formats need PIL"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    data = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono int16 samples → RIFF/WAVE PCM16 bytes (stdlib wave writer)."""
    import io
    import wave

    arr = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes → (sample_rate, mono int16 ndarray).
    Multi-channel input is averaged to mono (integer floor division)."""
    import io
    import wave

    if sniff(b) != "wav":
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(b), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        rate = w.getframerate()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        samples = (
            samples.reshape(-1, nch).astype(np.int32).sum(axis=1) // nch
        ).astype("<i2")
    return rate, samples
