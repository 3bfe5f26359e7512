"""Pure-Python codec correctness + decode_mode='real' behaviors
(operators/codecs.py, multimodal.py). X55's oracle parity covers the
BMP feature path; these pin the codecs themselves and the WAV/resize/
frame-sampling real paths."""

from __future__ import annotations

import numpy as np
import pytest

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators import codecs, multimodal


def test_bmp_roundtrip_color_and_gray():
    rng = np.random.default_rng(7)
    color = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp(color)) == color).all()
    # odd width exercises the 4-byte row padding (3*3=9 → pad 3)
    gray = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    decoded = codecs.decode_bmp(codecs.encode_bmp(gray))
    assert decoded.shape == (4, 3, 3)
    assert (decoded[:, :, 0] == gray).all() and (decoded[:, :, 2] == gray).all()


def test_bmp_header_golden_bytes():
    b = codecs.encode_bmp(np.zeros((8, 8), dtype=np.uint8))
    assert b[:2] == b"BM" and len(b) == 246  # 54 header + 8*24 rows
    assert int.from_bytes(b[10:14], "little") == 54  # pixel offset
    assert int.from_bytes(b[18:22], "little") == 8  # width
    assert int.from_bytes(b[28:30], "little") == 24  # bpp


def test_wav_roundtrip_and_mono_mixdown():
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    rate, back = codecs.decode_wav(codecs.encode_wav(samples, 16000))
    assert rate == 16000 and (back == samples).all()


def test_codec_rejects_junk_and_compressed():
    with pytest.raises(ValueError, match="not a BMP"):
        codecs.decode_bmp(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="not a WAV"):
        codecs.decode_wav(b"ID3\x04rubbish")
    assert codecs.sniff(b"BMxx") == "bmp"
    assert codecs.sniff(b"RIFFxxxxWAVE") == "wav"
    assert codecs.sniff(b"\xff\xd8\xff") == "unknown"


def test_wav_real_features_match_byte_stats(spark, sf_dir):
    """attach_binary(codec='wav') stores text bytes as PCM16 samples, so
    real-decode features must equal the raw byte statistics (and
    n_frames = one per sample = len(text))."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.attach_binary(docs, codec="wav")
    got = {
        r.doc_id: (r.n_frames, r.features)
        for r in multimodal.extract_features(media, decode_mode="real").collect()
    }
    for row in docs.select("doc_id", "text").collect():
        b = row.text.encode()
        n_frames, feats = got[row.doc_id]
        assert n_frames == len(b)
        assert feats[0] == pytest.approx(sum(b) / len(b))
        assert feats[1] == float(min(b)) and feats[2] == float(max(b))
        assert feats[3] == float(len(b))


def test_resize_real_nearest_neighbour(spark):
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    media = spark.createDataFrame(
        [(1, bytearray(codecs.encode_bmp(px)))], "doc_id long, payload binary"
    )
    out = multimodal.resize(media, width=4, height=4, decode_mode="real").collect()
    assert out[0].width == 4 and out[0].height == 4
    back = codecs.decode_bmp(bytes(out[0].payload))
    # nearest-neighbour with 2x downscale keeps rows/cols 0,2,4,6
    assert (back[:, :, 0] == px[::2, ::2]).all()


def test_sample_frames_real_wav_blocks(spark):
    samples = np.arange(1500, dtype=np.int16)  # 3000 PCM bytes
    media = spark.createDataFrame(
        [(1, bytearray(codecs.encode_wav(samples)))], "doc_id long, payload binary"
    )
    frames = multimodal.sample_frames(
        media, frame_bytes=1000, every_nth=2, decode_mode="real"
    ).collect()
    # 3 blocks of 1000 PCM bytes, every 2nd kept → idx 0 and 2
    assert [f.frame_idx for f in frames] == [0, 2]
    assert bytes(frames[0].frame) == samples[:500].tobytes()


def test_embed_real_is_deterministic_unit_norm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = multimodal.attach_binary(docs, codec="bmp")
    emb = {
        r.doc_id: r.embedding
        for r in multimodal.embed_media(media, decode_mode="real").collect()
    }
    again = {
        r.doc_id: r.embedding
        for r in multimodal.embed_media(media, decode_mode="real").collect()
    }
    assert emb == again
    for v in emb.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_phash_brightness_invariance_and_noise(spark):
    """pHash thresholds AC coefficients only, so a uniform brightness
    shift (pure-DC change) leaves the hash IDENTICAL; flipping one
    pixel moves few bits; an unrelated image is far."""
    import numpy as np

    from swivel_spark_prep_spark.operators import codecs
    from swivel_spark_prep_spark.operators.multimodal import phash

    rng = np.random.default_rng(7)
    base = rng.integers(40, 200, size=(8, 8)).astype(np.uint8)
    bright = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    noisy = base.copy()
    noisy[3, 4] = 255 - noisy[3, 4]
    other = rng.integers(0, 255, size=(8, 8)).astype(np.uint8)
    rows = [
        (1, bytearray(codecs.encode_bmp(base))),
        (2, bytearray(codecs.encode_bmp(bright))),
        (3, bytearray(codecs.encode_bmp(noisy))),
        (4, bytearray(codecs.encode_bmp(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r.doc_id: r.phash for r in phash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert h[1] == h[2]  # brightness shift → identical hash
    assert ham(h[1], h[3]) <= 8  # single-pixel flip stays close
    assert ham(h[1], h[4]) > 12  # unrelated image is far


def test_phash_matches_driver_numpy(spark, sf_dir):
    """Arrow-batched pHash == a driver-side recompute through the same
    decode + DCT math (pins batch stacking, grayscale, median/threshold
    and bit packing)."""
    import numpy as np

    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators import codecs
    from swivel_spark_prep_spark.operators.multimodal import (
        _dct_matrix,
        attach_binary,
        phash,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary(docs, codec="bmp")
    got = {r.doc_id: r.phash for r in phash(media).collect()}
    C = _dct_matrix(8)
    for r in media.collect():
        px = codecs.decode_bmp(bytes(r.payload)).astype(float).mean(axis=2)
        ac = (C @ px @ C.T).flatten()[1:]
        bits = ac > np.median(ac)
        h = 0
        for bit in bits:
            h = (h << 1) | int(bit)
        assert got[r.doc_id] == h, r.doc_id


def test_phash_banding_recall_equals_all_pairs(spark, sf_dir):
    """Pigeonhole banding must recover EVERY pair within the Hamming
    budget (hamming <= bands-1 guarantees a shared band) — compared
    against a driver-side all-pairs scan of the same hashes."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.multimodal import (
        attach_binary,
        phash,
        phash_near_dups,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, codec="bmp")
    hashes = {r.doc_id: r.phash for r in phash(media).collect()}
    ids = sorted(hashes)
    want = {
        (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
        for a, i in enumerate(ids)
        for j in ids[a + 1 :]
        if bin(hashes[i] ^ hashes[j]).count("1") <= 3
    }
    got = {
        (r.i, r.j, r.hamming)
        for r in phash_near_dups(media, max_hamming=3).collect()
    }
    assert got == want


def test_audio_fingerprint_amplitude_invariant(spark):
    """FFT is linear: halving amplitude must not move the top spectral
    bins — identical fingerprint set. Identical audio → identical set;
    a different signal → disjoint-ish."""
    import numpy as np

    from swivel_spark_prep_spark.operators import codecs
    from swivel_spark_prep_spark.operators.multimodal import audio_fingerprint

    rng = np.random.default_rng(11)
    sig = (rng.standard_normal(400) * 1000).astype("<i2")
    half = (sig.astype(int) // 2).astype("<i2")
    other = (rng.standard_normal(400) * 1000).astype("<i2")
    rows = [
        (1, bytearray(codecs.encode_wav(sig))),
        (2, bytearray(codecs.encode_wav(half))),
        (3, bytearray(codecs.encode_wav(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = audio_fingerprint(df).collect()
    s1 = {r.fp for r in fp if r.doc_id == 1}
    s2 = {r.fp for r in fp if r.doc_id == 2}
    s3 = {r.fp for r in fp if r.doc_id == 3}
    assert s1 and s1 == s2  # amplitude-invariant
    assert len(s1 & s3) < len(s1)  # different signal separates


def test_phash_handles_non_8x8_images(spark):
    """Real-world images aren't 8x8: a 16x16 BMP must hash (area-pooled
    to 8x8 first, per the classic recipe), and a 2x-upscaled image must
    hash IDENTICALLY to its original (block means reproduce the source
    pixels exactly)."""
    import numpy as np

    from swivel_spark_prep_spark.operators import codecs
    from swivel_spark_prep_spark.operators.multimodal import phash

    rng = np.random.default_rng(3)
    small = rng.integers(0, 255, size=(8, 8)).astype(np.uint8)
    big = np.kron(small, np.ones((2, 2), dtype=np.uint8))  # 16x16 upscale
    rows = [
        (1, bytearray(codecs.encode_bmp(small))),
        (2, bytearray(codecs.encode_bmp(big))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = {r.doc_id: r.phash for r in phash(df).collect()}
    assert h[1] == h[2]
