"""Hypothesis properties for the pure-Python kernels (no Spark in the
loop — hundreds of examples are cheap): BPE merge/encode invariants and
the BMP/WAV codec round-trips. These are the driver-side reference
semantics the distributed paths are pinned against elsewhere."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from swivel_spark_prep_spark.operators import codecs
from swivel_spark_prep_spark.operators.bpe import (
    _merge_symbols,
    _train_merges,
    encode_word,
)

_word = st.text(alphabet="ab0", min_size=0, max_size=30)
_sym = st.text(alphabet="ab0", min_size=1, max_size=3)


@given(_word, _sym, _sym)
@settings(max_examples=300, deadline=None)
def test_encode_word_concatenation_invariant(word, a, b):
    """Tokens always concatenate back to the word, whatever the merges."""
    toks = encode_word(word, [(a, b), (a + b, a)])
    assert "".join(toks) == word


@given(st.lists(_sym, min_size=0, max_size=20), _sym, _sym)
@settings(max_examples=300, deadline=None)
def test_merge_symbols_single_pass_properties(sym, a, b):
    out = _merge_symbols(sym, a, b)
    # token mass is conserved
    assert "".join(out) == "".join(sym)
    # after one pass no (a, b) adjacency survives UNLESS the merge itself
    # re-creates one (possible when a == b == a+b-halves overlap is gone:
    # merged token a+b equals a, i.e. b == "" — excluded by min_size=1).
    if a + b not in (a, b):
        assert all(
            not (x == a and y == b) for x, y in zip(out, out[1:])
        ) or a + b in out  # a fresh pair can only involve a merged token
    # idempotence when the pair never occurred
    if all(not (x == a and y == b) for x, y in zip(sym, sym[1:])):
        assert out == sym


@given(
    st.lists(
        st.tuples(st.text(alphabet="abc", min_size=1, max_size=8),
                  st.integers(min_value=1, max_value=50)),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_train_merges_deterministic_and_bounded(word_counts):
    m1 = _train_merges(list(word_counts), num_merges=10, min_pair_count=2)
    m2 = _train_merges(list(word_counts), num_merges=10, min_pair_count=2)
    assert m1 == m2  # deterministic under dict/set iteration
    assert len(m1) <= 10
    assert len(set(m1)) == len(m1)  # a pair is never learned twice


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (codecs.decode_bmp(codecs.encode_bmp(img)) == img).all()


@given(
    st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=0,
        max_size=200,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    got_rate, back = codecs.decode_wav(codecs.encode_wav(arr, rate))
    assert got_rate == rate and (back == arr).all()


# ---------------------------------------------------------- byte-complete

# Mixed alphabet: letters/digits, ASCII punctuation, whitespace, and
# multibyte UTF-8 (2-, 3-, and 4-byte sequences) — plus uppercase so the
# lowercase normalization boundary is exercised. Kept to characters whose
# lowercase mapping is locale-stable across Python/JVM/utf8proc.
_bc_text = st.text(
    alphabet="abz09 .,!?-\t\n'\"(){}éüλ中\U0001F600ABZ",
    min_size=0,
    max_size=60,
)


@given(_bc_text)
@settings(max_examples=300, deadline=None)
def test_byte_complete_roundtrip_exact(text):
    """Byte-complete contract: detokenize(encode(text)) == lower(text)
    EXACTLY — punctuation, whitespace runs, and multibyte characters all
    survive (the alnum-only mode drops them by design)."""
    import re

    from swivel_spark_prep_spark.operators.bpe import (
        _PIECE_RE,
        DEMO_MERGES_BYTES,
        detokenize,
    )

    toks: list[str] = []
    for p in re.findall(_PIECE_RE, text.lower()):
        toks.extend(encode_word(p, DEMO_MERGES_BYTES, byte_complete=True))
    assert detokenize(toks) == text.lower()


@given(_bc_text, st.text(alphabet="abz09", min_size=1, max_size=2),
       st.text(alphabet="abz09", min_size=1, max_size=2))
@settings(max_examples=200, deadline=None)
def test_byte_complete_roundtrip_any_merges(text, a, b):
    """The round-trip holds for ARBITRARY merge tables, including byte
    merges that split a multibyte character across tokens — detokenize
    concatenates bytes before UTF-8 decoding, so token boundaries need
    not respect character boundaries."""
    import re

    from swivel_spark_prep_spark.operators.bpe import (
        _PIECE_RE,
        detokenize,
    )

    merges = [(a, b), ("#c3", "#a9"), ("#f0", "#9f"), ("#98#80", "#20")]
    toks: list[str] = []
    for p in re.findall(_PIECE_RE, text.lower()):
        toks.extend(encode_word(p, merges, byte_complete=True))
    assert detokenize(toks) == text.lower()


# --- avro spec kernel -------------------------------------------------------


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_zigzag_roundtrip(n):
    from swivel_spark_prep_spark.sinks import avro as av

    enc = av.zigzag_encode(n)
    dec, pos = av.zigzag_decode(memoryview(enc), 0)
    assert dec == n and pos == len(enc)


def test_avro_zigzag_golden_bytes():
    """Spec examples (Avro 1.11 'Binary Encoding'): 0→00, -1→01, 1→02,
    -2→03, 2→04, -64→7f, 64→80 01."""
    from swivel_spark_prep_spark.sinks import avro as av

    golden = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
              2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in golden.items():
        assert av.zigzag_encode(n) == b, n


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=True)),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31), max_size=8)),
        ),
        max_size=50,
    ),
    st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=30, deadline=None)
def test_avro_container_roundtrip(rows, codec):
    """encode → container (both codecs) → parse reproduces every value,
    including nulls, negative longs, unicode, empty arrays."""
    import tempfile

    from swivel_spark_prep_spark.sinks import avro as av

    avsc = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": ["null", "double"]},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": ["null", {"type": "array", "items": "long"}]},
        ],
    }
    ftypes = av.field_types_of(avsc)
    recs = [av.encode_record(ftypes, list(r)) for r in rows]
    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        av.write_container(f.name, avsc, recs, codec=codec, block_records=7)
        schema, got = av.read_container(open(f.name, "rb").read())
    assert schema == avsc
    assert got == [list(r) for r in rows]


def test_avro_container_detects_corruption():
    import tempfile

    import pytest

    from swivel_spark_prep_spark.sinks import avro as av

    avsc = {"type": "record", "name": "row",
            "fields": [{"name": "a", "type": ["null", "long"]}]}
    ftypes = av.field_types_of(avsc)
    recs = [av.encode_record(ftypes, [i]) for i in range(100)]
    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        av.write_container(f.name, avsc, recs, codec="null")
        data = bytearray(open(f.name, "rb").read())
        data[-8] ^= 0xFF  # flip a sync byte of the last block
        with pytest.raises(ValueError, match="sync"):
            av.read_container(bytes(data))


# --- WARC kernel (sinks/warc.py) ---


def test_warc_golden_bytes():
    from swivel_spark_prep_spark.sinks import warc as wk

    rec = wk.encode_record(
        "resource", "<urn:doc:7>", "2024-01-01T00:00:00Z", b"hi", [("X-Meta-lang", "en")]
    )
    assert rec == (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:doc:7>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"X-Meta-lang: en\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"hi\r\n\r\n"
    )


@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
    st.sampled_from(["none", "gzip"]),
)
@settings(max_examples=40, deadline=None)
def test_warc_container_roundtrip(payloads, codec):
    """Any payload bytes — including CRLF-CRLF look-alikes — survive the
    container round trip because Content-Length drives the parse."""
    from swivel_spark_prep_spark.sinks import warc as wk

    recs = [
        wk.encode_record("resource", f"<urn:doc:{i}>", "2024-01-01T00:00:00Z", p)
        for i, p in enumerate(payloads)
    ]
    blob = (
        b"".join(wk.gzip_member(r) for r in recs)
        if codec == "gzip"
        else b"".join(recs)
    )
    parsed = wk.parse_warc_bytes(blob)
    assert [r["payload"] for r in parsed] == payloads
    assert [r["record_id"] for r in parsed] == [
        f"<urn:doc:{i}>" for i in range(len(payloads))
    ]


def test_warc_detects_corruption():
    import pytest

    from swivel_spark_prep_spark.sinks import warc as wk

    rec = wk.encode_record("resource", "<id>", "2024-01-01T00:00:00Z", b"abcdef")
    with pytest.raises(ValueError):
        wk.parse_warc_bytes(rec[:-6])  # truncated payload/trailer
    with pytest.raises(ValueError):
        wk.parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")  # not a WARC
    with pytest.raises(ValueError):
        wk.parse_warc_bytes(wk.gzip_member(rec)[:-3])  # truncated member
    with pytest.raises(ValueError):
        # trailing garbage after a valid member raises gzip.BadGzipFile
        # (an OSError, NOT a zlib.error subclass) — must map to the
        # parser's documented ValueError like every malformed path
        wk.parse_warc_bytes(wk.gzip_member(rec) + b"NOTGZIP")
    with pytest.raises(ValueError):
        wk.parse_warc_bytes(b"\x1f\x8bGARBAGE")  # bad member header
    with pytest.raises(ValueError):
        wk.encode_record("r", "<i>", "d", b"", [("X", "bad\r\nheader")])
    with pytest.raises(ValueError):
        wk.encode_record("r", "<urn:evil\r\nContent-Length: 0>", "d", b"")
    with pytest.raises(ValueError):
        wk.encode_record("r", "<i>", "2024\n", b"")


def test_warc_parses_foreign_common_crawl_shape():
    """A hand-built warcinfo + request + response container (the Common
    Crawl record mix, with HTTP headers inside the response payload and
    a WARC-Target-URI field) parses field-for-field — the reader is not
    limited to this sink's own records."""
    from swivel_spark_prep_spark.sinks import warc as wk

    info = wk.encode_record(
        "warcinfo", "<urn:uuid:1>", "2024-01-01T00:00:00Z",
        b"software: test/1.0\r\nformat: WARC File Format 1.0\r\n",
    )
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"\r\n"
        b"<html><body>hello</body></html>"
    )
    resp = wk.encode_record(
        "response", "<urn:uuid:2>", "2024-01-01T00:00:01Z", http,
        [("WARC-Target-URI", "http://example.com/"),
         ("Content-Type", "application/http; msgtype=response")],
    )
    blob = wk.gzip_member(info) + wk.gzip_member(resp)
    recs = wk.parse_warc_bytes(blob)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["headers"]["WARC-Target-URI"] == "http://example.com/"
    assert recs[1]["payload"] == http
    assert b"hello" in recs[1]["payload"]
