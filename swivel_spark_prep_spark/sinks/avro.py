"""Pure-Python Avro Object Container File sink + decoder kernels.

Implements the Avro 1.11 spec (binary encoding §"Binary Encoding",
container format §"Object Container Files") from the public spec, the
same way codecs.py implements BMP/WAV from format specs — no avro
package needed:

- longs/ints: zigzag varint; strings/bytes: length-prefixed; doubles/
  floats: little-endian IEEE; booleans: one byte; arrays: block
  count + items + 0 terminator; every field is the union
  ``["null", T]`` (Spark columns are nullable by default) encoded as
  branch index + value.
- container: ``Obj\\x01`` magic, metadata map (``avro.schema`` JSON +
  ``avro.codec``), 16-byte sync marker, then blocks of
  (record count, byte length, payload, sync). ``deflate`` is raw
  RFC 1951 (zlib with wbits=-15) exactly as the spec requires, so
  files interoperate with any standard Avro reader.

Type mapping (both directions, logical types per spec):
long/int→long, double/float→double, string→string, boolean→boolean,
binary→bytes, date→int+logicalType:date, timestamp/timestamp_ntz→
long+logicalType:timestamp-micros, array<prim>→array.

The distributed writer/reader live in sinks.write_avro /
sources.read_avro; this module is the spec kernel, unit-tested on
golden bytes + round-trip properties.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "long",
    "short": "long",
    "byte": "long",
    "double": "double",
    "float": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "timestamp-micros"},
}


def avro_schema_for(spark_schema) -> dict:
    """Avro record schema (as a dict) for a Spark StructType; every
    field is nullable (union with null), matching Spark semantics."""
    fields = []
    for f in spark_schema.fields:
        tn = f.dataType.typeName()
        if tn == "array":
            et = f.dataType.elementType.typeName()
            if et not in _SPARK_TO_AVRO:
                raise ValueError(f"unsupported avro array element: {et}")
            at = {"type": "array", "items": _SPARK_TO_AVRO[et]}
        elif tn in _SPARK_TO_AVRO:
            at = _SPARK_TO_AVRO[tn]
        else:
            raise ValueError(f"unsupported avro field type: {tn} ({f.name})")
        fields.append({"name": f.name, "type": ["null", at]})
    return {"type": "record", "name": "row", "fields": fields}


def spark_schema_for(avro_schema: dict) -> str:
    """Inverse mapping: Avro record schema → Spark DDL string."""
    back = {
        "long": "bigint",
        "double": "double",
        "string": "string",
        "boolean": "boolean",
        "bytes": "binary",
    }

    def one(t):
        if isinstance(t, list):  # union ["null", T]
            t = [x for x in t if x != "null"][0]
        if isinstance(t, dict):
            if t.get("logicalType") == "date":
                return "date"
            if t.get("logicalType") == "timestamp-micros":
                return "timestamp_ntz"
            if t.get("type") == "array":
                return f"array<{one(t['items'])}>"
            t = t["type"]
        return back[t]

    cols = [f"{f['name']} {one(f['type'])}" for f in avro_schema["fields"]]
    return ", ".join(cols)


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _enc_value(t, v, out: bytearray) -> None:
    """Encode one non-null value of resolved Avro type ``t`` (the
    union's value branch)."""
    if t == "long":
        out += zigzag_encode(int(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b))
        out += b
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b))
        out += b
    elif isinstance(t, dict) and t.get("logicalType") == "date":
        out += zigzag_encode(int(v))  # days since epoch
    elif isinstance(t, dict) and t.get("logicalType") == "timestamp-micros":
        out += zigzag_encode(int(v))  # µs since epoch
    elif isinstance(t, dict) and t.get("type") == "array":
        items = list(v)
        if items:
            out += zigzag_encode(len(items))
            for it in items:
                _enc_value(t["items"], it, out)
        out += zigzag_encode(0)
    else:  # pragma: no cover - schema construction prevents this
        raise ValueError(f"unsupported avro type: {t}")


def encode_record(field_types: list, values: list) -> bytes:
    """One record: per field, union index (0=null, 1=value) + value."""
    out = bytearray()
    for t, v in zip(field_types, values):
        if v is None:
            out += zigzag_encode(0)
        else:
            out += zigzag_encode(1)
            _enc_value(t, v, out)
    return bytes(out)


def _dec_value(t, buf: memoryview, pos: int):
    if t == "long":
        return zigzag_decode(buf, pos)
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if t == "boolean":
        return bool(buf[pos]), pos + 1
    if t == "bytes":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if isinstance(t, dict) and t.get("logicalType") in (
        "date",
        "timestamp-micros",
    ):
        return zigzag_decode(buf, pos)
    if isinstance(t, dict) and t.get("type") == "array":
        items = []
        while True:
            n, pos = zigzag_decode(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size hint (spec-legal)
                _, pos = zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _dec_value(t["items"], buf, pos)
                items.append(v)
    raise ValueError(f"unsupported avro type: {t}")  # pragma: no cover


def decode_records(
    field_types: list, payload: bytes, n_records: int
) -> list[list]:
    buf = memoryview(payload)
    pos = 0
    rows = []
    for _ in range(n_records):
        row = []
        for t in field_types:
            idx, pos = zigzag_decode(buf, pos)
            if idx == 0:
                row.append(None)
            else:
                v, pos = _dec_value(t, buf, pos)
                row.append(v)
        rows.append(row)
    if pos != len(buf):
        raise ValueError(f"trailing bytes in avro block: {len(buf) - pos}")
    return rows


def field_types_of(avro_schema: dict) -> list:
    """Resolved value-branch type per field (unions are ["null", T])."""
    out = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = [x for x in t if x != "null"][0]
        out.append(t)
    return out


def write_container(
    path: str,
    avro_schema: dict,
    records: list[bytes],
    codec: str = "deflate",
    sync: bytes | None = None,
    block_records: int = 4096,
) -> int:
    """Write one .avro container file from pre-encoded records."""
    import os

    if sync is None:
        sync = os.urandom(16)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode(),
        }
        f.write(zigzag_encode(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            f.write(zigzag_encode(len(kb)))
            f.write(kb)
            f.write(zigzag_encode(len(v)))
            f.write(v)
        f.write(zigzag_encode(0))
        f.write(sync)
        for i in range(0, len(records), block_records):
            chunk = records[i : i + block_records]
            data = b"".join(chunk)
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                data = co.compress(data) + co.flush()
            f.write(zigzag_encode(len(chunk)))
            f.write(zigzag_encode(len(data)))
            f.write(data)
            f.write(sync)
    return len(records)


def read_container(content: bytes):
    """Parse one .avro container file → (avro_schema, rows:list[list]).
    Verifies magic, codec, per-block sync markers, and exact block
    consumption."""
    buf = memoryview(content)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an avro container (bad magic)")
    pos = 4
    meta = {}
    while True:
        n, pos = zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # block with byte-size (spec-legal for maps)
            _, pos = zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = zigzag_decode(buf, pos)
            k = bytes(buf[pos : pos + kl]).decode()
            pos += kl
            vl, pos = zigzag_decode(buf, pos)
            meta[k] = bytes(buf[pos : pos + vl])
            pos += vl
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    ftypes = field_types_of(schema)
    rows: list[list] = []
    while pos < len(buf):
        n_rec, pos = zigzag_decode(buf, pos)
        n_bytes, pos = zigzag_decode(buf, pos)
        data = bytes(buf[pos : pos + n_bytes])
        pos += n_bytes
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        rows.extend(decode_records(ftypes, data, n_rec))
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
        pos += 16
    return schema, rows


def read_container_header(head: bytes) -> dict:
    """Parse just the header of a container file → the avro schema dict
    (driver-side schema peek for sources.read_avro)."""
    buf = memoryview(head)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an avro container (bad magic)")
    pos = 4
    while True:
        n, pos = zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = zigzag_decode(buf, pos)
            k = bytes(buf[pos : pos + kl]).decode()
            pos += kl
            vl, pos = zigzag_decode(buf, pos)
            v = bytes(buf[pos : pos + vl])
            pos += vl
            if k == "avro.schema":
                return json.loads(v)
    raise ValueError("avro container missing avro.schema metadata")
