"""Minimal Apache Avro Object Container File codec — pure Python, schema
driven, written from the public Avro 1.11 specification (binary encoding +
object container files). The container ships no avro/fastavro, but Iceberg
REQUIRES manifests and manifest lists to be Avro (spec: "Manifests are Avro
files"), so the spec exporter (export.py) carries its own encoder; the
decoder exists for round-trip tests and for reading exported manifests back.

Supported (everything Iceberg manifest schemas need):
  primitives null/boolean/int/long/float/double/bytes/string, record,
  array, map, union (index-prefixed), fixed.
Not supported (not needed): enums, named-type references, codecs other
than null, logical-type validation (attributes pass through untouched).

Binary encoding, per the spec:
  int/long  zigzag then little-endian base-128 varint (7 bits/byte)
  float/double  IEEE-754 little-endian 4/8 bytes
  bytes/string  long(length) + raw bytes (string = UTF-8)
  record  fields concatenated in schema order
  union  long(branch index) + encoded value
  array/map  blocks: long(count) items..., terminated by count 0
  OCF  b"Obj\\x01" + metadata map (avro.schema, avro.codec) + 16-byte sync
       marker, then blocks of (long count, long byte length, data, sync)
"""

from __future__ import annotations

import io
import json
import struct


# ------------------------------------------------------------------ encode


def _zigzag(n: int) -> bytes:
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


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick the branch the value fits
        # _fits only discriminates null vs non-null, which is complete for
        # the ['null', X] optional unions the Iceberg manifests use — guard
        # that shape so a future multi-branch union fails loudly instead of
        # silently encoding under the wrong branch index.
        if len(schema) != 2 or "null" not in schema:
            raise ValueError(
                f"only 2-branch optional unions supported, got {schema}"
            )
        for i, branch in enumerate(schema):
            if _fits(branch, value):
                out.write(_zigzag(i))
                _encode(branch, value, out)
                return
        raise ValueError(f"value {value!r} fits no union branch {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag(int(value)))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        b = bytes(value)
        out.write(_zigzag(len(b)))
        out.write(b)
    elif t == "string":
        b = str(value).encode("utf-8")
        out.write(_zigzag(len(b)))
        out.write(b)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(b)}")
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "array":
        items = list(value or [])
        if items:
            out.write(_zigzag(len(items)))
            for it in items:
                _encode(schema["items"], it, out)
        out.write(_zigzag(0))
    elif t == "map":
        entries = dict(value or {})
        if entries:
            out.write(_zigzag(len(entries)))
            for k, v in entries.items():
                _encode("string", k, out)
                _encode(schema["values"], v, out)
        out.write(_zigzag(0))
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _fits(branch, value) -> bool:
    t = branch["type"] if isinstance(branch, dict) else branch
    if t == "null":
        return value is None
    return value is not None


# ------------------------------------------------------------------ decode


class _Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError
        self.pos += n
        return b

    def varlong(self) -> int:
        shift = z = 0
        while True:
            b = self.read(1)[0]
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)  # un-zigzag


def _decode(schema, r: _Reader):
    if isinstance(schema, list):
        return _decode(schema[r.varlong()], r)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.varlong()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.varlong())
    if t == "string":
        return r.read(r.varlong()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.varlong()
            if n == 0:
                return out
            if n < 0:  # sized block: skip the byte length
                n = -n
                r.varlong()
            for _ in range(n):
                out.append(_decode(schema["items"], r))
    if t == "map":
        out = {}
        while True:
            n = r.varlong()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.varlong()
            for _ in range(n):
                k = r.read(r.varlong()).decode("utf-8")
                out[k] = _decode(schema["values"], r)
    raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------------------------- OCF

_MAGIC = b"Obj\x01"
# deterministic sync marker: exports are reproducible byte-for-byte
_SYNC = bytes(range(16))


def write_ocf(schema: dict, records: list[dict]) -> bytes:
    """Serialize records into one Avro Object Container File (codec null)."""
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        _encode("string", k, out)
        _encode("bytes", v, out)
    out.write(_zigzag(0))
    out.write(_SYNC)
    if records:
        body = io.BytesIO()
        for rec in records:
            _encode(schema, rec, body)
        data = body.getvalue()
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(data)))
        out.write(data)
        out.write(_SYNC)
    return out.getvalue()


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Parse one OCF: returns (schema, records)."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.varlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.varlong()
        for _ in range(n):
            k = r.read(r.varlong()).decode("utf-8")
            meta[k] = r.read(r.varlong())
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError(f"unsupported codec {meta['avro.codec']!r}")
    schema = json.loads(meta["avro.schema"])
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.buf):
        count = r.varlong()
        r.varlong()  # block byte length
        for _ in range(count):
            records.append(_decode(schema, r))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records
