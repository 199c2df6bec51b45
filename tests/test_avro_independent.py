"""INDEPENDENT validation of the Avro export — two legs, neither of which
uses icelite/avro.py's decoder:

1. Golden byte vectors taken verbatim from the Apache Avro 1.11
   specification's own binary-encoding examples (PUBLIC content:
   https://avro.apache.org/docs/1.11.1/specification/ — "Binary Encoding"
   gives `long` zigzag values, the string "foo" → 06 66 6f 6f, the record
   example {"a": 27, "b": "foo"} → 36 06 66 6f 6f, and the array
   [3, 27] → 04 06 36 00). The encoder must reproduce them bit-exactly.

2. A from-scratch Object Container File reader written in THIS test file
   directly against the spec's OCF section (magic Obj\\x01, metadata map,
   16-byte sync marker, blocks of (count, size, data, sync)), structured
   as an independent recursive-descent decoder. It parses a real exported
   manifest list + manifest and the decoded rows must match table truth.
   Self-consistency of avro.py (its decoder reading its encoder) is proven
   elsewhere; THIS file is the cross-check that the bytes on disk are
   spec-Avro, not merely round-trippable.
"""

import json
import os
import struct

import pytest

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.icelite.avro import write_ocf
from olake_spark.icelite.export import export_iceberg

# ---------------------------------------------------------------- leg 1


def _record_body(schema: dict, record: dict) -> bytes:
    """Encode one record via avro.py and strip the OCF framing, leaving the
    raw datum bytes the spec's examples are expressed in."""
    blob = write_ocf(schema, [record])
    # skip magic, metadata map, sync; then (count, size) varints precede data
    pos = 4
    # metadata map: count, then count * (string key, bytes value), then 0
    def varlong(b, p):
        shift = z = 0
        while True:
            byte = b[p]
            p += 1
            z |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1), p

    n, pos = varlong(blob, pos)
    for _ in range(n):
        klen, pos = varlong(blob, pos)
        pos += klen
        vlen, pos = varlong(blob, pos)
        pos += vlen
    zero, pos = varlong(blob, pos)
    assert zero == 0
    pos += 16  # sync
    cnt, pos = varlong(blob, pos)
    size, pos = varlong(blob, pos)
    assert cnt == 1
    return blob[pos:pos + size]


class TestSpecGoldenBytes:
    """Byte vectors published in the Avro spec itself."""

    def test_spec_record_example(self):
        # The spec's canonical example: record with long a=27, string b="foo"
        # encodes to exactly 36 06 66 6f 6f
        schema = {
            "type": "record", "name": "test",
            "fields": [{"name": "a", "type": "long"},
                       {"name": "b", "type": "string"}],
        }
        assert _record_body(schema, {"a": 27, "b": "foo"}) == \
            bytes([0x36, 0x06, 0x66, 0x6F, 0x6F])

    def test_spec_zigzag_table(self):
        # the spec's long encoding table: 0→00, -1→01, 1→02, -2→03, 2→04,
        # -64→7f, 64→80 01
        schema = {"type": "record", "name": "l",
                  "fields": [{"name": "v", "type": "long"}]}
        for value, raw in [
            (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
            (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
        ]:
            assert _record_body(schema, {"v": value}) == raw, value

    def test_spec_array_example(self):
        # the spec's array example: [3, 27] as array<long> → 04 06 36 00
        schema = {
            "type": "record", "name": "a",
            "fields": [{"name": "v", "type": {"type": "array",
                                              "items": "long"}}],
        }
        assert _record_body(schema, {"v": [3, 27]}) == \
            bytes([0x04, 0x06, 0x36, 0x00])

    def test_spec_union_example(self):
        # spec union example for ["null","string"]: null → 00;
        # "a" → 02 02 61
        schema = {
            "type": "record", "name": "u",
            "fields": [{"name": "v", "type": ["null", "string"]}],
        }
        assert _record_body(schema, {"v": None}) == b"\x00"
        assert _record_body(schema, {"v": "a"}) == b"\x02\x02\x61"


# ------------------------------------------------- leg 2: fresh decoder


class _Cur:
    """Byte cursor for the independent decoder."""

    def __init__(self, data: bytes):
        self.b = data
        self.p = 0

    def take(self, n: int) -> bytes:
        out = self.b[self.p:self.p + n]
        assert len(out) == n, "truncated"
        self.p += n
        return out

    def long(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def string(self) -> str:
        return self.take(self.long()).decode("utf-8")

    def bytes_(self) -> bytes:
        return self.take(self.long())


def _decode_datum(schema, c: _Cur):
    """Recursive-descent datum decoder, written against the spec's binary
    encoding section — intentionally NOT importing anything from avro.py."""
    if isinstance(schema, list):  # union: zigzag branch index, then datum
        return _decode_datum(schema[c.long()], c)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return c.take(1) == b"\x01"
    if t in ("int", "long"):
        return c.long()
    if t == "float":
        return struct.unpack("<f", c.take(4))[0]
    if t == "double":
        return struct.unpack("<d", c.take(8))[0]
    if t == "bytes":
        return c.bytes_()
    if t == "string":
        return c.string()
    if t == "fixed":
        return c.take(schema["size"])
    if t == "record":
        return {f["name"]: _decode_datum(f["type"], c)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = c.long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                c.long()
                n = -n
            for _ in range(n):
                out.append(_decode_datum(schema["items"], c))
    if t == "map":
        out = {}
        while True:
            n = c.long()
            if n == 0:
                return out
            if n < 0:
                c.long()
                n = -n
            for _ in range(n):
                k = c.string()  # key precedes value in the byte stream
                out[k] = _decode_datum(schema["values"], c)
    raise AssertionError(f"unhandled Avro type {t!r}")


def _read_container(path: str):
    c = _Cur(open(path, "rb").read())
    assert c.take(4) == b"Obj\x01", "bad OCF magic"
    meta = {}
    while True:
        n = c.long()
        if n == 0:
            break
        if n < 0:
            c.long()
            n = -n
        for _ in range(n):
            k = c.string()  # key precedes value in the byte stream
            meta[k] = c.bytes_()
    assert meta.get("avro.codec", b"null") == b"null"
    schema = json.loads(meta["avro.schema"])
    sync = c.take(16)
    rows = []
    while c.p < len(c.b):
        cnt = c.long()
        size = c.long()
        end = c.p + size
        for _ in range(cnt):
            rows.append(_decode_datum(schema, c))
        assert c.p == end, "block length mismatch"
        assert c.take(16) == sync, "sync marker mismatch"
    return schema, rows


def test_exported_manifests_parse_with_independent_decoder(
    spark, tmp_table_dir
):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "imgs"), datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 90), max_records_per_file=30)
    t.delete_where("image_id like '%3'")
    out = export_iceberg(t, os.path.join(tmp_table_dir, "exp"))

    # manifest list first
    _, mlist = _read_container(out["manifest_list"])
    assert {m["manifest_path"] for m in mlist} == set(out["manifests"])
    assert all(isinstance(m["added_snapshot_id"], int) for m in mlist)

    # every manifest: decoded entries match table truth
    truth = {t._abs(e.file_path): e for e in t.entries()}
    seen = {}
    for mpath in out["manifests"]:
        schema, recs = _read_container(mpath)
        assert schema["name"] == "manifest_entry"
        for r in recs:
            df = r["data_file"]
            seen[df["file_path"]] = df
    assert set(seen) == set(truth)
    for path, df in seen.items():
        e = truth[path]
        assert df["record_count"] == e.record_count
        assert df["file_size_in_bytes"] == e.file_size_bytes
        assert df["content"] == e.content
        # typed partition value round-trips through the independent decoder
        pv = df["partition"]["_p_image_id_bucket4"]
        if "_p_image_id_bucket4" in e.partition:
            assert pv == int(e.partition["_p_image_id_bucket4"])
        else:  # unpartitioned delete file: optional field is null
            assert pv is None
    # bounds maps decode as (field-id, bytes) arrays with LE payloads
    some = next(df for df in seen.values()
                if df["content"] == 0 and df["lower_bounds"])
    for kv in some["lower_bounds"]:
        assert isinstance(kv["key"], int) and isinstance(kv["value"], bytes)
