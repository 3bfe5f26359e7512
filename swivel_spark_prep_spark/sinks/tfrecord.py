"""TFRecord sink — pure-Python encoder, no TensorFlow dependency.

The reference's sink is one ``tf.train.Example`` per co-occurrence shard in
TFRecord files (SURVEY.md §1.1 D7: features global_row, global_col,
sparse_local_row, sparse_local_col, sparse_value — the public prep.py
output format). Spark has no built-in TFRecord writer, so we emit the
format directly (SURVEY.md §4.3):

- TFRecord framing: uint64-LE length, masked CRC32C of the length, the
  payload, masked CRC32C of the payload (mask = ((crc>>15 | crc<<17) +
  0xa282ead8) mod 2^32) — the public TFRecord spec.
- ``tf.train.Example`` protobuf wire format hand-encoded: Example{1:
  Features{1: map<string, Feature>}}, Feature{1: BytesList | 2: FloatList
  | 3: Int64List}, packed repeated scalars.

Shard files are written executor-side via ``applyInPandas`` over
(row_shard, col_shard) groups — one task per shard, fully parallel, no
driver materialization.
"""

from __future__ import annotations

import os
import struct

# --- CRC32C (Castagnoli), table-driven ------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding ---------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_int64(n: int) -> bytes:
    # int64 values are plain varints (two's complement, 10 bytes when
    # negative) — tf.train.Int64List does not zigzag.
    return _varint(n & 0xFFFFFFFFFFFFFFFF)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def encode_int64_list(values) -> bytes:
    packed = b"".join(_varint_int64(int(v)) for v in values)
    return _len_delim(1, packed)  # Int64List.value = 1, packed


def encode_float_list(values) -> bytes:
    packed = struct.pack(f"<{len(values)}f", *[float(v) for v in values])
    return _len_delim(1, packed)  # FloatList.value = 1, packed


def encode_bytes_list(values) -> bytes:
    out = b"".join(
        _len_delim(1, v if isinstance(v, bytes) else str(v).encode("utf-8"))
        for v in values
    )
    return out  # BytesList.value = 1, repeated (not packed)


def encode_feature(kind: str, values) -> bytes:
    if kind == "bytes":
        inner = _len_delim(1, encode_bytes_list(values))
    elif kind == "float":
        inner = _len_delim(2, encode_float_list(values))
    elif kind == "int64":
        inner = _len_delim(3, encode_int64_list(values))
    else:
        raise ValueError(f"unknown feature kind {kind}")
    return inner  # Feature message body


def encode_example(features: dict[str, tuple[str, list]]) -> bytes:
    """features: name → (kind, values); kind ∈ {bytes, float, int64}."""
    entries = b""
    for name, (kind, values) in sorted(features.items()):
        entry = _len_delim(1, name.encode("utf-8")) + _len_delim(
            2, encode_feature(kind, values)
        )
        entries += _len_delim(1, entry)  # Features.feature map entry
    features_msg = entries
    return _len_delim(1, features_msg)  # Example.features = 1


def write_tfrecord(path: str, payloads) -> int:
    """Write serialized protobuf payloads with TFRecord framing."""
    n = 0
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        for payload in payloads:
            length = struct.pack("<Q", len(payload))
            f.write(length)
            f.write(struct.pack("<I", _masked_crc(length)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
            n += 1
    return n


def read_tfrecord(path: str) -> list[bytes]:
    """Read back TFRecord payloads, verifying both CRCs (test utility)."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return out
            (length,) = struct.unpack("<Q", header)
            (len_crc,) = struct.unpack("<I", f.read(4))
            assert len_crc == _masked_crc(header), "length CRC mismatch"
            payload = f.read(length)
            (data_crc,) = struct.unpack("<I", f.read(4))
            assert data_crc == _masked_crc(payload), "data CRC mismatch"
            out.append(payload)


# --- swivel shard writer ---------------------------------------------------

def write_swivel_shards(result, out_dir: str) -> int:
    """One `shard-XXX-YYY.pb` TFRecord per (row_shard, col_shard), each
    holding a single tf.train.Example with the prep.py feature layout.
    Runs executor-side (applyInPandas per shard group)."""
    import pandas as pd

    n = result.num_shards
    shard_size = max(result.vocab_size // n, 1)
    os.makedirs(out_dir, exist_ok=True)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        i = int(pdf["row_shard"].iloc[0])
        j = int(pdf["col_shard"].iloc[0])
        pdf = pdf.sort_values(["local_row", "local_col"])
        # global token ids covered by this shard's rows/cols (modulo layout)
        global_row = [i + k * n for k in range(shard_size)]
        global_col = [j + k * n for k in range(shard_size)]
        example = encode_example(
            {
                "global_row": ("int64", global_row),
                "global_col": ("int64", global_col),
                "sparse_local_row": ("int64", pdf["local_row"].tolist()),
                "sparse_local_col": ("int64", pdf["local_col"].tolist()),
                "sparse_value": ("float", pdf["w"].tolist()),
            }
        )
        path = os.path.join(out_dir, f"shard-{i:03d}-{j:03d}.pb")
        write_tfrecord(path, [example])
        return pd.DataFrame(
            {"row_shard": [i], "col_shard": [j], "nnz": [len(pdf)]}
        )

    written = (
        result.shards.groupBy("row_shard", "col_shard")
        .applyInPandas(_write, schema="row_shard long, col_shard long, nnz long")
        .count()
    )
    # Shard cells with zero entries produce no group above, but the prep.py
    # output contract has one file per (i,j) cell of the N×N grid — fill
    # the missing ones with empty sparse lists (driver-side; they hold
    # nothing beyond the global id vectors).
    present = {f for f in os.listdir(out_dir) if f.startswith("shard-")}
    for i in range(n):
        for j in range(n):
            fname = f"shard-{i:03d}-{j:03d}.pb"
            if fname not in present:
                example = encode_example(
                    {
                        "global_row": ("int64", [i + k * n for k in range(shard_size)]),
                        "global_col": ("int64", [j + k * n for k in range(shard_size)]),
                        "sparse_local_row": ("int64", []),
                        "sparse_local_col": ("int64", []),
                        "sparse_value": ("float", []),
                    }
                )
                write_tfrecord(os.path.join(out_dir, fname), [example])
                written += 1
    return written


def write_tfrecord_docs(df, out_dir: str, overwrite: bool = True) -> int:
    """Distributed generic document sink: one ``part-NNNNN.tfrecord``
    per partition, each row a tf.train.Example whose feature kinds are
    derived from the Spark schema (integral → int64, floating → float,
    string/binary → bytes, array thereof → the list form). Runs
    executor-side through mapInPandas — memory is O(Arrow batch), the
    driver collects only the row count. NULLs encode as empty feature
    lists (the tf.train.Example convention for absent values)."""
    import shutil

    import pandas as pd
    from pyspark import TaskContext

    if overwrite:
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def _kind(dt) -> tuple[str, bool]:
        name = dt.typeName()
        if name == "array":
            k, _ = _kind(dt.elementType)
            return k, True
        if name in ("long", "integer", "short", "byte", "boolean"):
            return "int64", False
        if name in ("double", "float"):
            return "float", False
        return "bytes", False

    schema = df.schema
    kinds = [(f.name, *_kind(f.dataType)) for f in schema.fields]

    def _write(batches):
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.tfrecord")
        n = 0
        f = None  # opened lazily: empty partitions write no file
        try:
            for pdf in batches:
                if f is None:
                    f = open(path, "wb")
                for row in pdf.itertuples(index=False):
                    feats = {}
                    for (name, kind, is_list), val in zip(kinds, row):
                        if val is None or (
                            not is_list and isinstance(val, float)
                            and pd.isna(val)
                        ):
                            vals = []
                        elif is_list:
                            vals = list(val)
                        elif kind == "bytes":
                            vals = [val if isinstance(val, bytes)
                                    else str(val).encode("utf-8")]
                        else:
                            vals = [val]
                        if kind == "bytes" and is_list:
                            vals = [v if isinstance(v, bytes)
                                    else str(v).encode("utf-8") for v in vals]
                        feats[name] = (kind, vals)
                    payload = encode_example(feats)
                    length = struct.pack("<Q", len(payload))
                    f.write(length)
                    f.write(struct.pack("<I", _masked_crc(length)))
                    f.write(payload)
                    f.write(struct.pack("<I", _masked_crc(payload)))
                    n += 1
        finally:
            if f is not None:
                f.close()
        yield pd.DataFrame({"n": [n]})

    counts = df.mapInPandas(_write, schema="n long")
    import pyspark.sql.functions as _F

    return counts.agg(_F.sum("n")).collect()[0][0] or 0


# --- minimal protobuf wire decoding (the encoder's exact inverse) ----------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    val, shift = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a protobuf message body;
    value is an int for varint/fixed fields, bytes for length-delimited."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field_no, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = buf[i : i + 4]
            i += 4
        elif wt == 1:  # 64-bit
            val = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field_no, wt, val


def _to_int64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _decode_feature(buf: bytes) -> tuple[str, list]:
    for field_no, _, inner in _iter_fields(buf):
        if field_no == 1:  # BytesList: repeated bytes value = 1
            return "bytes", [v for _, _, v in _iter_fields(inner)]
        if field_no == 2:  # FloatList: packed float value = 1
            vals: list = []
            for _, wt, v in _iter_fields(inner):
                if wt == 2:  # packed
                    vals.extend(struct.unpack(f"<{len(v) // 4}f", v))
                else:  # unpacked fixed32
                    vals.extend(struct.unpack("<f", v))
            return "float", vals
        if field_no == 3:  # Int64List: packed varint value = 1
            ints: list = []
            for _, wt, v in _iter_fields(inner):
                if wt == 2:  # packed
                    i = 0
                    while i < len(v):
                        u, i = _read_varint(v, i)
                        ints.append(_to_int64(u))
                else:  # unpacked varint
                    ints.append(_to_int64(v))
            return "int64", ints
    return "bytes", []  # empty Feature


def decode_example(payload: bytes) -> dict[str, tuple[str, list]]:
    """Inverse of :func:`encode_example`: tf.train.Example bytes →
    name → (kind, values). Round-trip pinned by test."""
    out: dict[str, tuple[str, list]] = {}
    for field_no, _, features_msg in _iter_fields(payload):
        if field_no != 1:  # Example.features
            continue
        for f_no, _, entry in _iter_fields(features_msg):
            if f_no != 1:  # Features.feature map entry
                continue
            name, feat = "", b""
            for e_no, _, v in _iter_fields(entry):
                if e_no == 1:
                    name = v.decode("utf-8")
                elif e_no == 2:
                    feat = v
            out[name] = _decode_feature(feat)
    return out


def parse_tfrecord_stream(data: bytes) -> list[bytes]:
    """TFRecord framing parser over in-memory bytes, verifying both CRCs
    — the executor-side twin of :func:`read_tfrecord`."""
    out, i = [], 0
    while i < len(data):
        header = data[i : i + 8]
        (length,) = struct.unpack("<Q", header)
        (len_crc,) = struct.unpack("<I", data[i + 8 : i + 12])
        if len_crc != _masked_crc(header):
            raise ValueError(f"length CRC mismatch at offset {i}")
        payload = data[i + 12 : i + 12 + length]
        (data_crc,) = struct.unpack("<I", data[i + 12 + length : i + 16 + length])
        if data_crc != _masked_crc(payload):
            raise ValueError(f"data CRC mismatch at offset {i}")
        out.append(payload)
        i += 16 + length
    return out
