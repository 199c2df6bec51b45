"""Iceberg-spec export: Avro codec round-trips + spec-field conformance of
the one-way exporter (metadata.json + Avro manifest list + manifests)."""

import json
import os
import struct

import pytest

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.icelite.avro import read_ocf, write_ocf
from olake_spark.icelite.export import export_iceberg


class TestAvroCodec:
    def test_roundtrip_all_types(self):
        schema = {
            "type": "record",
            "name": "t",
            "fields": [
                {"name": "b", "type": "boolean"},
                {"name": "i", "type": "int"},
                {"name": "l", "type": "long"},
                {"name": "f", "type": "float"},
                {"name": "d", "type": "double"},
                {"name": "s", "type": "string"},
                {"name": "by", "type": "bytes"},
                {"name": "u", "type": ["null", "long"]},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
                {"name": "nested", "type": {
                    "type": "record", "name": "inner",
                    "fields": [{"name": "x", "type": ["null", "string"]}],
                }},
            ],
        }
        recs = [
            {"b": True, "i": -7, "l": 2**40, "f": 1.5, "d": -3.25,
             "s": "héllo", "by": b"\x00\xff", "u": None,
             "arr": [1, -2, 3], "m": {"a": "x", "b": "y"},
             "nested": {"x": "deep"}},
            {"b": False, "i": 0, "l": -(2**40), "f": 0.0, "d": 0.0,
             "s": "", "by": b"", "u": 99,
             "arr": [], "m": {}, "nested": {"x": None}},
        ]
        got_schema, got = read_ocf(write_ocf(schema, recs))
        assert got_schema == schema
        assert got == recs

    def test_zigzag_extremes(self):
        schema = {"type": "record", "name": "z",
                  "fields": [{"name": "v", "type": "long"}]}
        vals = [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
        _, got = read_ocf(write_ocf(schema, [{"v": v} for v in vals]))
        assert [r["v"] for r in got] == vals

    def test_empty_file(self):
        schema = {"type": "record", "name": "e",
                  "fields": [{"name": "v", "type": "string"}]}
        s, recs = read_ocf(write_ocf(schema, []))
        assert s == schema and recs == []


# spec v2 required table-metadata fields (Iceberg table spec, "Table
# Metadata Fields", format-version 2 requirements)
REQUIRED_METADATA_FIELDS = [
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
    "partition-specs", "default-spec-id", "last-partition-id",
    "sort-orders", "default-sort-order-id",
]

REQUIRED_DATA_FILE_FIELDS = [
    "content", "file_path", "file_format", "partition", "record_count",
    "file_size_in_bytes",
]


@pytest.fixture()
def exported(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "imgs"), datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 120), max_records_per_file=40)
    # both delete kinds so all three manifest groups exist
    t.row_delta(
        None,
        t.scan(columns=["image_id"]).limit(5).select("image_id"),
    )
    t.delete_where("image_id like '%7'")
    dest = os.path.join(tmp_table_dir, "iceberg-export")
    return t, export_iceberg(t, dest)


class TestExportConformance:
    def test_metadata_json_required_fields(self, exported):
        t, out = exported
        meta = json.load(open(out["metadata_json"]))
        for k in REQUIRED_METADATA_FIELDS:
            assert k in meta, f"spec-required field missing: {k}"
        assert meta["format-version"] == 2
        schema = meta["schemas"][meta["current-schema-id"]]
        names = [f["name"] for f in schema["fields"]]
        assert names == [f.name for f in datagen.IMAGES_SCHEMA.fields]
        fids = [f["id"] for f in schema["fields"]]
        assert fids == sorted(fids) and len(set(fids)) == len(fids)
        assert meta["last-column-id"] == max(fids)
        # identifier fields resolve to real field ids
        id_ids = schema["identifier-field-ids"]
        assert id_ids == [
            f["id"] for f in schema["fields"] if f["name"] == "image_id"
        ]
        # partition spec: bucket[4] over image_id, field-id 1000
        spec = meta["partition-specs"][meta["default-spec-id"]]
        pf = spec["fields"][0]
        assert pf["transform"] == "bucket[4]"
        assert pf["source-id"] == id_ids[0]
        assert pf["field-id"] == 1000
        assert meta["last-partition-id"] == 1000
        assert meta["refs"]["main"]["snapshot-id"] == \
            meta["current-snapshot-id"]

    def test_manifest_list_and_manifests_decode(self, exported):
        t, out = exported
        meta = json.load(open(out["metadata_json"]))
        snap = meta["snapshots"][0]
        assert snap["manifest-list"] == out["manifest_list"]
        _, mlist = read_ocf(open(out["manifest_list"], "rb").read())
        # data + eq-deletes + pos-deletes
        assert sorted(m["content"] for m in mlist) == [0, 1, 1]
        for m in mlist:
            assert os.path.getsize(m["manifest_path"]) == \
                m["manifest_length"]
            _, entries = read_ocf(open(m["manifest_path"], "rb").read())
            assert len(entries) == m["added_files_count"]
            assert sum(e["data_file"]["record_count"] for e in entries) == \
                m["added_rows_count"]
            for e in entries:
                df = e["data_file"]
                for k in REQUIRED_DATA_FILE_FIELDS:
                    assert k in df
                assert df["file_format"] == "PARQUET"
                assert os.path.exists(df["file_path"])  # zero-copy refs
        # data rows in the export == live data rows in the table
        data_m = next(m for m in mlist if m["content"] == 0)
        _, data_entries = read_ocf(
            open(data_m["manifest_path"], "rb").read()
        )
        from olake_spark.icelite.table import DATA
        assert sum(e["data_file"]["record_count"] for e in data_entries) \
            == sum(x.record_count for x in t.entries() if x.content == DATA)

    def test_bounds_use_single_value_binary(self, exported):
        t, out = exported
        meta = json.load(open(out["metadata_json"]))
        schema = meta["schemas"][0]
        by_id = {f["id"]: f for f in schema["fields"]}
        _, mlist = read_ocf(open(out["manifest_list"], "rb").read())
        data_m = next(m for m in mlist if m["content"] == 0)
        _, entries = read_ocf(open(data_m["manifest_path"], "rb").read())
        e = entries[0]["data_file"]
        lowers = {kv["key"]: kv["value"] for kv in e["lower_bounds"]}
        uppers = {kv["key"]: kv["value"] for kv in e["upper_bounds"]}
        for fid, lo in lowers.items():
            f = by_id[fid]
            if f["type"] == "int":
                assert len(lo) == 4
                assert struct.unpack("<i", lo)[0] <= \
                    struct.unpack("<i", uppers[fid])[0]
            elif f["type"] == "long":
                assert len(lo) == 8
            elif f["type"] == "string":
                lo.decode("utf-8")
        # eq-delete manifest carries equality_ids = identifier field ids
        eqm = [m for m in mlist if m["content"] == 1]
        for m in eqm:
            _, dels = read_ocf(open(m["manifest_path"], "rb").read())
            for d in dels:
                if d["data_file"]["equality_ids"] is not None:
                    assert d["data_file"]["equality_ids"] == \
                        schema["identifier-field-ids"]

    def test_export_is_readonly_on_source(self, spark, exported):
        t, _ = exported
        before = t.scan().count()
        t.refresh()
        assert t.scan().count() == before  # source untouched


class TestImportRoundTrip:
    def test_export_import_scan_equality(self, spark, exported, tmp_table_dir):
        """Full interop loop: icelite → spec-v2 Iceberg (Avro manifests) →
        fresh icelite table. The imported table's scan must equal the
        source's (both delete kinds applied), files shared by reference."""
        from olake_spark.icelite.export import import_iceberg

        t, out = exported
        imp = import_iceberg(
            spark, out["metadata_json"],
            os.path.join(tmp_table_dir, "imported"),
        )
        cols = ["image_id", "w", "h", "fmt", "caption", "phash"]
        src_rows = {tuple(r) for r in t.scan(columns=cols).collect()}
        imp_rows = {tuple(r) for r in imp.scan(columns=cols).collect()}
        assert imp_rows == src_rows
        assert imp.identifier_fields == list(t.identifier_fields) or \
            tuple(imp.identifier_fields) == tuple(t.identifier_fields)
        # schema and partition spec survived the trip
        assert [f.name for f in imp.schema.fields] == \
            [f.name for f in t.schema.fields]
        assert [(p.source, p.transform, p.n) for p in imp.spec.fields] == \
            [(p.source, p.transform, p.n) for p in t.spec.fields]
        # data + eq-delete files are shared by reference (zero copy)
        from olake_spark.icelite.table import DATA, EQ_DELETES
        for e in imp.entries():
            if e.content in (DATA, EQ_DELETES):
                assert os.path.isabs(e.file_path)
        # and the import is maintainable: compaction folds it into owned files
        from olake_spark.operators.compact import run_compaction
        run_compaction(imp, "post-import", fill_ratio=1.0)
        imp.refresh()
        assert {tuple(r) for r in imp.scan(columns=cols).collect()} == src_rows


class TestOpenInPlace:
    """open_iceberg: scan a spec table where it lies — zero writes, both
    delete kinds, real-Iceberg manifest shapes the exporter never emits."""

    COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]

    @staticmethod
    def _tree(root):
        return {
            os.path.join(d, f)
            for d, _, fs in os.walk(root) for f in fs
        }

    def test_scan_equality_zero_write(self, spark, exported):
        from olake_spark.icelite.export import open_iceberg

        t, out = exported
        exp_dir = os.path.dirname(os.path.dirname(out["metadata_json"]))
        before = self._tree(exp_dir) | self._tree(t.root)
        got = {
            tuple(r) for r in
            open_iceberg(spark, out["metadata_json"])
            .select(*self.COLS).collect()
        }
        src = {tuple(r) for r in t.scan(columns=self.COLS).collect()}
        assert got == src and got
        # in-place means IN PLACE: not one file created anywhere
        assert (self._tree(exp_dir) | self._tree(t.root)) == before

    def test_root_resolution_columns_and_bad_snapshot(self, spark, exported):
        from olake_spark.icelite.export import open_iceberg

        t, out = exported
        root = os.path.dirname(os.path.dirname(out["metadata_json"]))
        df = open_iceberg(spark, root, columns=["image_id"])
        assert df.columns == ["image_id"]
        assert {r.image_id for r in df.collect()} == {
            r.image_id for r in t.scan(columns=["image_id"]).collect()
        }
        with pytest.raises(ValueError, match="snapshot"):
            open_iceberg(spark, root, snapshot_id=999999)

    def test_real_iceberg_manifest_shapes(self, spark, exported):
        """Shapes real Iceberg writers produce that icelite's own exporter
        never does: file:// URIs on every path, null entry sequence numbers
        (spec inheritance from the manifest-list entry), a status=2 DELETED
        data entry that must leave the live set, and a positional-delete
        file whose row keys are full URIs."""
        import copy

        import pyarrow as pa
        import pyarrow.parquet as pq

        from olake_spark.icelite.export import open_iceberg

        t, out = exported
        mdir = os.path.dirname(out["metadata_json"])
        base = {r.image_id for r in t.scan(columns=["image_id"]).collect()}

        data_mf = next(
            p for p in out["manifests"]
            if os.path.basename(p).startswith("manifest-data-")
        )
        eschema, recs = read_ocf(open(data_mf, "rb").read())
        assert len(recs) >= 2
        victim, survivor = recs[0], recs[1]
        victim_ids = {
            r.image_id for r in spark.read.parquet(
                victim["data_file"]["file_path"]
            ).select("image_id").collect()
        }
        for r in recs:
            r["data_file"]["file_path"] = \
                "file://" + r["data_file"]["file_path"]
            r["sequence_number"] = None
            r["file_sequence_number"] = None
        victim["status"] = 2  # DELETED in this snapshot
        with open(data_mf, "wb") as f:
            f.write(write_ocf(eschema, recs))

        # full-URI pos-delete killing row 0 of the survivor file
        surv_path = survivor["data_file"]["file_path"][len("file://"):]
        pos0_id = pq.read_table(
            surv_path, columns=["image_id"]
        )["image_id"][0].as_py()
        pdel_path = os.path.join(mdir, "extra-posdel.parquet")
        pq.write_table(
            pa.table(
                {"file_path": ["file://" + surv_path], "pos": [0]},
                schema=pa.schema(
                    [("file_path", pa.string()), ("pos", pa.int64())]
                ),
            ),
            pdel_path,
        )
        pos_mf = next(
            p for p in out["manifests"]
            if os.path.basename(p).startswith("manifest-pos-deletes-")
        )
        pschema, precs = read_ocf(open(pos_mf, "rb").read())
        extra = copy.deepcopy(precs[0])
        extra["data_file"]["file_path"] = pdel_path
        extra["data_file"]["record_count"] = 1
        extra["data_file"]["file_size_in_bytes"] = \
            os.path.getsize(pdel_path)
        extra["data_file"]["lower_bounds"] = None
        extra["data_file"]["upper_bounds"] = None
        precs.append(extra)
        with open(pos_mf, "wb") as f:
            f.write(write_ocf(pschema, precs))

        got = {
            r.image_id for r in open_iceberg(
                spark, out["metadata_json"], columns=["image_id"]
            ).collect()
        }
        assert got == (base - victim_ids) - {pos0_id}


class TestAvroCodecProperties:
    def test_random_values_roundtrip(self):
        """Hypothesis: any value assignment for a compound schema survives
        encode→decode byte-exactly (ints full 64-bit range, unicode incl.
        surrogates-free text, bytes, optionals, lists, maps)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        schema = {
            "type": "record", "name": "prop",
            "fields": [
                {"name": "l", "type": "long"},
                {"name": "i", "type": "int"},
                {"name": "s", "type": "string"},
                {"name": "by", "type": "bytes"},
                {"name": "d", "type": "double"},
                {"name": "b", "type": "boolean"},
                {"name": "u", "type": ["null", "string"]},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "long"}},
            ],
        }
        rec = st.fixed_dictionaries({
            "l": st.integers(-(2**63), 2**63 - 1),
            "i": st.integers(-(2**31), 2**31 - 1),
            "s": st.text(max_size=50),
            "by": st.binary(max_size=50),
            "d": st.floats(allow_nan=False),
            "b": st.booleans(),
            "u": st.none() | st.text(max_size=20),
            "arr": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
            "m": st.dictionaries(st.text(min_size=1, max_size=10),
                                 st.integers(-(2**63), 2**63 - 1),
                                 max_size=6),
        })

        @settings(max_examples=200, deadline=None)
        @given(st.lists(rec, max_size=10))
        def check(records):
            got_schema, got = read_ocf(write_ocf(schema, records))
            assert got_schema == schema
            assert got == records

        check()


def test_multi_branch_union_refused():
    """_fits discriminates only null vs non-null — complete for ['null', X]
    optionals, ambiguous beyond. A 3-branch union must fail loudly rather
    than silently encode under the first non-null branch."""
    schema = {"type": "record", "name": "u",
              "fields": [{"name": "v",
                          "type": ["null", "int", "string"]}]}
    with pytest.raises(ValueError, match="2-branch"):
        write_ocf(schema, [{"v": "s"}])


def test_partition_values_spec_typed(spark, tmp_table_dir):
    """Exported manifests carry partition tuples in the SPEC's typed form
    (transform result types, time transforms counted from epoch), not
    icelite's directory strings — and import inverts them exactly."""
    from olake_spark.icelite.export import import_iceberg

    df = spark.range(0, 24).selectExpr(
        "cast(id as string) as doc_id",
        "cast(id as int) as n",
        "timestamp'2024-03-05 07:00:00' + make_interval(0,0,0,0,id) as ts",
    )
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "pt"), df.schema,
        PartitionSpec((
            PartitionField("doc_id", "bucket", 4),
            PartitionField("ts", "month"),
            PartitionField("ts", "day"),
            PartitionField("ts", "hour"),
            PartitionField("ts", "year"),
            PartitionField("n", "truncate", 10),
        )),
        identifier_fields=("doc_id",),
    )
    t.append(df)
    out = export_iceberg(t, os.path.join(tmp_table_dir, "exp"))

    from olake_spark.icelite.avro import read_ocf
    schema_j, recs = read_ocf(open(out["manifests"][0], "rb").read())
    df_schema = next(
        fl["type"] for fl in schema_j["fields"] if fl["name"] == "data_file"
    )
    part_schema = next(
        f["type"] for f in df_schema["fields"] if f["name"] == "partition"
    )
    pfields = {f["name"]: f["type"] for f in part_schema["fields"]}
    # every partition field is an optional non-string typed value; the
    # 24-hour window starts 2024-03-05T07 and crosses midnight, so anchor
    # on the earliest-hour entry and check cross-field consistency on all
    import datetime
    days = (datetime.date(2024, 3, 5) - datetime.date(1970, 1, 1)).days
    parts = [r["data_file"]["partition"] for r in recs]
    for part in parts:
        assert isinstance(part["_p_doc_id_bucket4"], int)
        assert part["_p_ts_year"] == 2024 - 1970
        assert part["_p_ts_month"] == (2024 - 1970) * 12 + 2  # March
        assert part["_p_ts_hour"] // 24 == part["_p_ts_day"]
        assert isinstance(part["_p_n_truncate10"], int)
        assert part["_p_n_truncate10"] % 10 == 0
    assert min(p["_p_ts_hour"] for p in parts) == days * 24 + 7
    assert {p["_p_ts_day"] for p in parts} == {days, days + 1}
    # day field carries the date logicalType
    day_t = pfields["_p_ts_day"]
    assert day_t[1] == {"type": "int", "logicalType": "date"}

    # round trip: imported partition dict equals the source's strings
    imp = import_iceberg(
        spark, out["metadata_json"], os.path.join(tmp_table_dir, "imp")
    )
    src = {(e.file_path, tuple(sorted(e.partition.items())))
           for e in t.entries()}
    got = {(e.file_path, tuple(sorted(e.partition.items())))
           for e in imp.entries()}
    assert {p for _, p in got} == {p for _, p in src}
    assert imp.scan().orderBy("doc_id").collect() == \
        t.scan().orderBy("doc_id").collect()


class TestReviewRegressions:
    """Round-5 review findings on the interop surface."""

    def test_partition_codec_covers_real_iceberg_types(self):
        """Real warehouses partition by identity(ts)/float/double/decimal,
        truncate(decimal), and carry void transforms after spec evolution —
        the codec must not refuse them at eager build time."""
        from pyspark.sql import types as T

        from olake_spark.icelite.export import _partition_codec

        at, enc, dec = _partition_codec("identity", T.TimestampType())
        assert at == {"type": "long", "logicalType": "timestamp-micros"}
        assert dec(enc("2024-03-15 07:30:00.123456")) == \
            "2024-03-15T07:30:00.123456"
        for dt in (T.FloatType(), T.DoubleType()):
            _, enc, dec = _partition_codec("identity", dt)
            assert dec(enc("1.5")) == "1.5"
        for tr in ("identity", "truncate"):
            at, enc, dec = _partition_codec(tr, T.DecimalType(10, 2))
            assert at["logicalType"] == "decimal"
            assert dec(enc("-123.45")) == "-123.45"
            assert dec(enc("0.00")) == "0.00"
        _, enc, dec = _partition_codec("void", T.IntegerType())
        assert enc("anything") is None and dec(None) is None

    def test_open_iceberg_accepts_file_uris(self, spark, exported):
        from olake_spark.icelite.export import open_iceberg

        t, out = exported
        base = {r.image_id for r in t.scan(columns=["image_id"]).collect()}
        root = os.path.dirname(os.path.dirname(out["metadata_json"]))
        for loc in ("file://" + out["metadata_json"], "file://" + root):
            got = {
                r.image_id
                for r in open_iceberg(
                    spark, loc, columns=["image_id"]
                ).collect()
            }
            assert got == base

    def test_open_iceberg_empty_table(self, spark, tmp_path):
        """Real Iceberg writes current-snapshot-id -1 (and snapshots: [])
        for a table with no commits — a legal empty table, not an error."""
        import json

        from olake_spark.icelite.export import open_iceberg

        mdir = tmp_path / "t" / "metadata"
        mdir.mkdir(parents=True)
        meta = {
            "format-version": 2,
            "table-uuid": "0" * 32,
            "location": str(tmp_path / "t"),
            "current-schema-id": 0,
            "schemas": [{
                "schema-id": 0, "type": "struct",
                "fields": [
                    {"id": 1, "name": "image_id", "type": "string",
                     "required": True},
                    {"id": 2, "name": "w", "type": "int"},
                ],
            }],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "current-snapshot-id": -1,
            "snapshots": [],
        }
        (mdir / "v1.metadata.json").write_text(json.dumps(meta))
        df = open_iceberg(spark, str(tmp_path / "t"))
        assert df.columns == ["image_id", "w"]
        assert df.count() == 0
        # the omitted-key form is legal too
        del meta["current-snapshot-id"]
        del meta["snapshots"]
        (mdir / "v1.metadata.json").write_text(json.dumps(meta))
        assert open_iceberg(spark, str(tmp_path / "t")).count() == 0

    def test_import_accepts_table_root(self, spark, exported, tmp_table_dir):
        from olake_spark.icelite.export import import_iceberg

        t, out = exported
        root = os.path.dirname(os.path.dirname(out["metadata_json"]))
        dest = os.path.join(tmp_table_dir, "imported-from-root")
        t2 = import_iceberg(spark, root, dest)
        assert {r.image_id for r in t2.scan(columns=["image_id"]).collect()} \
            == {r.image_id for r in t.scan(columns=["image_id"]).collect()}

    def test_import_legacy_string_partition_values(self, spark, tmp_path,
                                                   tmp_table_dir):
        """Pre-round-5 exports serialized partition values as icelite's
        native strings; the importer must pass them through, not mis-decode
        ('2024' is the year 2024, not 1970+2024)."""
        from pyspark.sql import types as T

        from olake_spark.icelite.export import export_iceberg, import_iceberg
        from olake_spark.icelite.spec import PartitionField, PartitionSpec

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "dated"),
            T.StructType([
                T.StructField("id", T.StringType(), False),
                T.StructField("d", T.DateType(), True),
            ]),
            PartitionSpec((PartitionField("d", "year", 0),)),
            identifier_fields=("id",),
        )
        t.append(spark.createDataFrame(
            [("a", "2024-03-15"), ("b", "2025-07-01")],
            "id string, d string",
        ).selectExpr("id", "cast(d as date) as d"))
        out = export_iceberg(t, str(tmp_path / "exp"))

        # rewrite the data manifest's partition values to the legacy
        # string form under an Avro string schema
        data_mf = next(
            p for p in out["manifests"]
            if os.path.basename(p).startswith("manifest-data-")
        )
        eschema, recs = read_ocf(open(data_mf, "rb").read())
        pf = next(
            f for f in _iter_fields(eschema) if f["name"].startswith("_p_")
        )
        pf["type"] = ["null", "string"]
        for r in recs:
            part = r["data_file"]["partition"]
            for k, v in part.items():
                part[k] = str(1970 + int(v))  # legacy: calendar-year string
        with open(data_mf, "wb") as f:
            f.write(write_ocf(eschema, recs))

        t2 = import_iceberg(spark, out["metadata_json"],
                            os.path.join(tmp_table_dir, "legacy-import"))
        parts = {
            v for e in t2.entries() for k, v in (e.partition or {}).items()
        }
        assert parts == {"2024", "2025"}
        got = {(r.id, str(r.d)) for r in t2.scan().collect()}
        assert got == {("a", "2024-03-15"), ("b", "2025-07-01")}


def _iter_fields(schema):
    """All record fields anywhere in an Avro schema tree."""
    if isinstance(schema, dict):
        if schema.get("type") == "record":
            for f in schema["fields"]:
                yield f
                yield from _iter_fields(f["type"])
        elif schema.get("type") == "array":
            yield from _iter_fields(schema["items"])
    elif isinstance(schema, list):
        for b in schema:
            yield from _iter_fields(b)
