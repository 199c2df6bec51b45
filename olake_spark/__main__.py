"""CLI: the reference's verbs (spec/check/discover/sync + maintenance) as a
spark-submit-shippable entrypoint (north star: "ships as spark-submit
--py-files").

    spark-submit --py-files olake_spark.zip -m olake_spark <verb> ...
    python -m olake_spark check --warehouse /path
    python -m olake_spark discover --warehouse /path
    python -m olake_spark sync --table /path/tbl --source /path/batch.parquet \
        [--create --id-fields image_id] --key-col phash --n-chunks 16 \
        --job-id nightly --log /path/_mlog [--cdc-feed /path/feed --checkpoint /c]
    python -m olake_spark maintain --table /path/tbl --ops compact,cluster,expire \
        --job-id nightly --log /path/_mlog [--verify]
    python -m olake_spark bench

Verbs mirror protocol/root.go:73 (spec, check, discover, sync) with
`maintain` as the engine's own addition. `sync` = chunked resumable backfill
(rerunning with the same --job-id/--log skips completed chunks) followed by
a bounded CDC drain whose resume cursor is the streaming checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spec() -> dict:
    """JSON schema of the maintain-job config (the reference's `spec` verb —
    utils/jsonschema rendered for our config surface)."""
    return {
        "type": "object",
        "properties": {
            "table": {"type": "string", "description": "icelite table root"},
            "name": {"type": "string",
                     "description": "[ns.]table catalog identifier "
                                    "(alternative to table)"},
            "uri": {"type": "string",
                    "description": "REST catalog service URI (with name)"},
            "warehouse": {"type": "string",
                          "description": "filesystem catalog warehouse "
                                         "(with name)"},
            "ops": {
                "type": "array",
                "items": {
                    "enum": ["compact", "cluster", "manifests",
                             "rewrite-deletes", "analyze", "expire", "merge"]
                },
            },
            "job_id": {"type": "string"},
            "log": {"type": "string", "description": "maintenance-log table root"},
            "curve": {"enum": ["zorder", "hilbert"], "default": "hilbert"},
            "target_bytes": {"type": "integer", "default": 536870912},
            "verify": {"type": "boolean", "default": False},
            "keep_last": {"type": "integer", "default": 3},
            "grace_seconds": {"type": "number", "default": 259200},
        },
        "required": ["ops", "job_id"],
        # addressing: a raw table root, or a catalog identifier + backend
        "oneOf": [
            {"required": ["table"]},
            {"required": ["name", "uri"]},
            {"required": ["name", "warehouse"]},
        ],
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="olake_spark")
    sub = ap.add_subparsers(dest="verb", required=True)
    sub.add_parser("spec")
    p = sub.add_parser("check")
    p.add_argument("--warehouse", required=True)
    p = sub.add_parser("discover")
    p.add_argument("--warehouse", required=True)
    p = sub.add_parser("sync")
    p.add_argument("--table", required=True, help="icelite table root")
    p.add_argument("--source", required=True, help="parquet path of the source batch")
    p.add_argument("--create", action="store_true",
                   help="create the table from the source schema if absent")
    p.add_argument("--id-fields", default="",
                   help="comma list of identifier fields (used with --create)")
    p.add_argument("--key-col", default=None,
                   help="backfill chunk key; comma list = lexicographic composite (S8)")
    p.add_argument("--n-chunks", type=int, default=16)
    p.add_argument("--job-id", required=True)
    p.add_argument("--log", default=None,
                   help="maintenance-log root: backfill resume state lives here")
    p.add_argument("--cdc-feed", default=None,
                   help="parquet dir of change batches to drain after backfill")
    p.add_argument("--checkpoint", default=None,
                   help="streaming checkpoint dir (CDC resume cursor)")
    p = sub.add_parser("maintain")
    p.add_argument("--table", default=None,
                   help="icelite table root (or use --name with "
                        "--uri/--warehouse for catalog addressing)")
    p.add_argument("--name", default=None, help="[ns.]table identifier")
    p.add_argument("--uri", default=None, help="REST catalog service URI")
    p.add_argument("--warehouse", default=None,
                   help="filesystem catalog warehouse")
    p.add_argument("--ops", required=True,
                   help="comma list: compact,cluster,manifests,"
                        "rewrite-deletes,analyze,bloom,expire — or the "
                        "single word 'auto' to let the autopilot inspect "
                        "health and decide (policy via autopilot.* table "
                        "props)")
    p.add_argument("--bloom-columns", default=None,
                   help="comma list of columns for the explicit 'bloom' op "
                        "(incremental per-file Bloom index build)")
    p.add_argument("--dry-run", action="store_true",
                   help="with --ops auto: print the plan, run nothing")
    p.add_argument("--fleet", action="store_true",
                   help="with --ops auto and --uri/--warehouse (no table "
                        "addressing): run the autopilot over EVERY table "
                        "the catalog lists — the nightly fleet sweep; "
                        "per-table policy from each table's autopilot.* "
                        "properties")
    p.add_argument("--job-id", required=True)
    p.add_argument("--log", default=None)
    p.add_argument("--curve", default="hilbert")
    p.add_argument("--target-bytes", type=int, default=None)
    p.add_argument("--verify", action="store_true")
    # default None → the table's history.expire.* retention properties
    # decide (falling back to keep_last=1); an explicit flag overrides
    p.add_argument("--keep-last", type=int, default=None)
    p.add_argument("--grace-seconds", type=float, default=3 * 24 * 3600)
    p = sub.add_parser("inspect")
    p.add_argument("--table", required=True)
    p.add_argument(
        "--what", required=True,
        choices=["files", "partitions", "manifests", "snapshots",
                 "history", "refs", "all_files", "all_manifests"],
    )
    p.add_argument("--limit", type=int, default=1000,
                   help="max rows printed (files can be huge at scale)")
    p = sub.add_parser(
        "lookup",
        help="Bloom-pruned equality/IN read: scans only candidate files "
             "(metadata-only pruning; exact — the predicate is re-applied)",
    )
    p.add_argument("--table", required=True, help="icelite table root")
    p.add_argument("--column", required=True)
    p.add_argument("--values", required=True,
                   help="comma list of probe values, parsed to the "
                        "column's exact type (string/int/long/float/"
                        "double/boolean/date)")
    p.add_argument("--columns", default=None,
                   help="comma list of output columns (default: all)")
    p.add_argument("--build-index", action="store_true",
                   help="(re)build the column's Bloom index first "
                        "(incremental: covered files keep their bitmaps)")
    p.add_argument("--limit", type=int, default=1000)
    p = sub.add_parser("curate")
    p.add_argument("--input", required=True, help="parquet path to curate")
    p.add_argument("--output", required=True, help="parquet output path")
    p.add_argument("--sample-key", default=None,
                   help="column for deterministic hash sampling")
    p.add_argument("--sample-ppm", type=int, default=None,
                   help="keep rate in ppm (e.g. 250000 = 25%%)")
    p.add_argument("--cap-by", default=None,
                   help="comma list of group columns for a per-group quota")
    p.add_argument("--cap-key", default=None,
                   help="key column for the deterministic quota draw")
    p.add_argument("--cap-quota", type=int, default=None)
    p.add_argument("--scrub", default=None,
                   help="comma list of text columns to PII-scrub in place")
    p = sub.add_parser("add-files")
    p.add_argument("--table", required=True, help="icelite table root")
    p.add_argument("--source", required=True,
                   help="directory of existing parquet to register by "
                        "reference (metadata-only, zero copy)")
    p.add_argument("--allow-duplicates", action="store_true",
                   help="skip the already-referenced check")
    p = sub.add_parser("clone")
    p.add_argument("--table", required=True, help="source table root")
    p.add_argument("--dest", required=True,
                   help="destination root for the zero-copy clone")
    p = sub.add_parser("export")
    p.add_argument("--table", required=True, help="icelite table root")
    p.add_argument("--dest", required=True,
                   help="destination dir for spec-v2 Iceberg metadata "
                        "(metadata.json + Avro manifests; zero-copy)")
    p = sub.add_parser("import")
    p.add_argument("--metadata", required=True,
                   help="spec-v2 Iceberg metadata.json or table root")
    p.add_argument("--dest", default=None,
                   help="new icelite table root; omit to OPEN the table "
                        "in place (zero-copy read, no table created) and "
                        "print its live row count")
    p = sub.add_parser("catalog")
    p.add_argument("--warehouse", default=None)
    p.add_argument("--uri", default=None,
                   help="REST catalog service URI (use instead of "
                        "--warehouse to go through the HTTP backend)")
    p.add_argument("--serve", action="store_true",
                   help="run the REST catalog service over --warehouse "
                        "(blocks; use --port)")
    p.add_argument("--port", type=int, default=8181)
    p.add_argument("--op", default=None,
                   choices=["list", "create", "drop", "rename", "snapshot",
                            "register"])
    p.add_argument("--name", default=None, help="[ns.]table identifier")
    p.add_argument("--to", default=None, help="target for rename/snapshot")
    p.add_argument("--location", default=None,
                   help="register: existing table root to catalog")
    p.add_argument("--like", default=None,
                   help="create: parquet path whose schema the table copies")
    p.add_argument("--id-fields", default="", dest="cat_id_fields")
    p.add_argument("--purge", action="store_true")
    sub.add_parser("bench")
    args = ap.parse_args(argv)

    if args.verb == "catalog" and getattr(args, "serve", False):
        # pure stdlib HTTP service — never boot a Spark JVM for it
        from olake_spark.icelite.restcatalog import main as _serve_main

        if not args.warehouse:
            ap.error("catalog --serve needs --warehouse")
        _serve_main(["--warehouse", args.warehouse, "--port", str(args.port)])
        return 0

    if args.verb == "spec":
        print(json.dumps(_spec(), indent=2))
        return 0

    if args.verb == "bench":
        from bench import main as bench_main  # repo-root script

        bench_main()
        return 0

    from olake_spark.session import get_spark

    spark = get_spark(f"olake-{args.verb}")
    if args.verb == "check":
        from olake_spark.preflight import preflight

        out = preflight(spark, args.warehouse)
        print(json.dumps(out))
        return 0 if out["ok"] else 1
    if args.verb == "discover":
        from olake_spark.preflight import discover

        print(json.dumps(discover(spark, args.warehouse), indent=2))
        return 0

    if args.verb == "sync":
        # the reference's main verb (protocol/root.go:73): chunked resumable
        # backfill, then bounded CDC drain — state in --log / --checkpoint
        from olake_spark.checkpoint import MaintenanceLog
        from olake_spark.icelite import Table
        from olake_spark.sync import apply_cdc_stream, backfill

        source = spark.read.parquet(args.source)
        try:
            table = Table.load(spark, args.table)
        except FileNotFoundError:
            if not args.create:
                raise
            table = Table.create(
                spark, args.table, source.schema,
                identifier_fields=tuple(
                    f for f in args.id_fields.split(",") if f
                ),
            )
        log = MaintenanceLog(spark, args.log) if args.log else None
        out: dict = {}
        if args.key_col:
            key = [c for c in args.key_col.split(",") if c]
            out["backfill"] = backfill(
                table, source, key_col=key if len(key) > 1 else key[0],
                job_id=args.job_id, log=log, n_chunks=args.n_chunks,
            )
        if args.cdc_feed:
            schema = spark.read.parquet(args.cdc_feed).schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(args.cdc_feed)
            )
            ckpt = args.checkpoint or os.path.join(
                args.table, f"_cdc_ckpt_{args.job_id}"
            )
            apply_cdc_stream(table, stream, ckpt)
            out["cdc"] = {"applied": True, "checkpoint": ckpt}
        table.refresh()
        out["snapshot_id"] = table.current_snapshot_id
        out["total_records"] = table.total_records()
        print(json.dumps(out))
        return 0

    if args.verb == "curate":
        # corpus selection/cleaning: deterministic sample → stratified cap →
        # PII scrub, all pure Catalyst (functions/curate.py); deterministic
        # given the input, so re-runs produce byte-identical selections
        from pyspark.sql import functions as F

        from olake_spark.functions import curate

        df = spark.read.parquet(args.input)
        stats = {"rows_in": df.count()}
        if args.sample_key and args.sample_ppm is not None:
            df = curate.hash_sample(df, args.sample_key, args.sample_ppm)
        if args.cap_by and args.cap_quota is not None:
            if not args.cap_key:
                # the draw key makes the per-group pick deterministic; a
                # group column would be constant inside its window and turn
                # the quota into an arbitrary task-order selection
                print("--cap-by requires --cap-key (a per-row unique column "
                      "for the deterministic draw)", file=sys.stderr)
                return 2
            df = curate.stratified_cap(
                df, [c for c in args.cap_by.split(",") if c],
                args.cap_key, args.cap_quota,
            )
        for col in (args.scrub or "").split(","):
            col = col.strip()
            if col:
                df = df.withColumn(col, curate.scrub_pii_col(F.col(col)))
        df.write.mode("overwrite").parquet(args.output)
        stats["rows_out"] = spark.read.parquet(args.output).count()
        print(json.dumps(stats))
        return 0

    if args.verb == "inspect":
        from olake_spark.icelite import Table

        table = Table.load(spark, args.table)
        if args.what in ("all_files", "all_manifests"):
            from olake_spark.icelite import meta as _meta

            df = getattr(_meta, f"{args.what}_df")(table)
        else:
            df = getattr(table, f"inspect_{args.what}")()
        for line in df.limit(args.limit).toJSON().collect():
            print(line)
        return 0
    if args.verb == "lookup":
        from olake_spark.icelite import Table
        from olake_spark.icelite.bloom import (bloom_file_filter,
                                               build_bloom_index,
                                               point_lookup)

        table = Table.load(spark, args.table)
        dtype = next(
            (f.dataType.simpleString() for f in table.schema.fields
             if f.name == args.column), None,
        )
        if dtype is None:
            print(f"no such column {args.column!r}", file=sys.stderr)
            return 2
        # parse probes to the column's exact type — an unsupported type is
        # a loud error, never a silent string fallback (a string-hashed
        # probe against a typed build prunes every file and prints zero
        # rows for data that exists)
        import datetime as _dt

        casts = {
            "int": int, "smallint": int, "tinyint": int, "bigint": int,
            "double": float, "float": float, "string": str,
            "boolean": lambda s: {"true": True, "false": False}[s.lower()],
            "date": _dt.date.fromisoformat,
        }
        if dtype not in casts:
            print(f"lookup does not support {dtype!r} columns",
                  file=sys.stderr)
            return 2
        try:
            values = [casts[dtype](v) for v in args.values.split(",")]
        except (ValueError, KeyError) as ex:
            print(f"bad probe value for {dtype} column: {ex}",
                  file=sys.stderr)
            return 2
        if args.build_index:
            build_bloom_index(table, args.column, incremental=True)
        from olake_spark.icelite.table import DATA

        ff = bloom_file_filter(table, args.column, values)
        n_data = sum(1 for e in table.entries() if e.content == DATA)
        df = point_lookup(
            table, args.column, values,
            columns=args.columns.split(",") if args.columns else None,
            file_filter=ff,  # reuse: don't stream the shards twice
        )
        for line in df.limit(args.limit).toJSON().collect():
            print(line)
        print(json.dumps({
            "candidate_files": None if ff is None else len(ff),
            "data_files": n_data,
            "indexed": ff is not None,
        }), file=sys.stderr)
        return 0
    if args.verb == "add-files":
        from olake_spark.icelite import Table

        table = Table.load(spark, args.table)
        snap = table.add_files(
            args.source,
            check_duplicate_files=not args.allow_duplicates,
        )
        print(json.dumps({
            "snapshot_id": snap["snapshot_id"],
            "files_added": snap["summary"].get("added-files-by-reference", 0),
        }))
        return 0
    if args.verb == "export":
        from olake_spark.icelite import Table
        from olake_spark.icelite.export import export_iceberg

        out = export_iceberg(Table.load(spark, args.table), args.dest)
        print(json.dumps(out))
        return 0
    if args.verb == "import":
        from olake_spark.icelite.export import import_iceberg, open_iceberg

        if args.dest is None:
            df = open_iceberg(spark, args.metadata)
            print(json.dumps({
                "in_place": True,
                "rows": df.count(),
                "columns": df.columns,
            }))
            return 0
        t = import_iceberg(spark, args.metadata, args.dest)
        print(json.dumps({
            "dest": t.root,
            "rows": t.total_records(),
            "files_by_reference": sum(
                1 for e in t.entries() if os.path.isabs(e.file_path)
            ),
        }))
        return 0
    if args.verb == "catalog":
        from olake_spark.icelite import Catalog
        from olake_spark.icelite.restcatalog import RestCatalog

        if args.uri:
            cat = RestCatalog(spark, args.uri)
        elif args.warehouse:
            cat = Catalog(spark, args.warehouse)
        else:
            ap.error("catalog needs --warehouse or --uri")
        if not args.op:
            ap.error("catalog needs --op (or --serve)")
        if (args.op in ("create", "drop", "rename", "snapshot", "register")
                and not args.name):
            ap.error(f"catalog {args.op} needs --name")
        if args.op in ("rename", "snapshot") and not args.to:
            ap.error(f"catalog {args.op} needs --to")
        if args.op == "register" and not args.location:
            ap.error("catalog register needs --location")
        if args.op == "register" and not args.uri:
            ap.error(
                "catalog register needs --uri (the filesystem catalog "
                "cannot register an arbitrary root — HadoopCatalog parity)"
            )
        if args.op == "list":
            out = {
                ns: cat.list_tables(ns) for ns in cat.list_namespaces()
            }
            print(json.dumps(out))
        elif args.op == "create":
            if not args.like:
                ap.error("catalog create needs --like")
            schema = spark.read.parquet(args.like).schema
            ids = tuple(x for x in args.cat_id_fields.split(",") if x)
            t = cat.create_table(args.name, schema, identifier_fields=ids)
            print(json.dumps({"created": args.name, "root": t.root}))
        elif args.op == "drop":
            cat.drop_table(args.name, purge=args.purge)
            print(json.dumps({"dropped": args.name, "purged": args.purge}))
        elif args.op == "rename":
            t = cat.rename_table(args.name, args.to)
            print(json.dumps({"renamed": args.name, "to": args.to,
                              "root": t.root}))
        elif args.op == "register":
            t = cat.register_table(args.name, args.location)
            print(json.dumps({"registered": args.name, "root": t.root}))
        else:  # snapshot
            t = cat.snapshot_table(args.name, args.to)
            print(json.dumps({"cloned": args.name, "to": args.to,
                              "rows": t.total_records()}))
        return 0
    if args.verb == "clone":
        from olake_spark.icelite import Table, snapshot_table

        dest = snapshot_table(Table.load(spark, args.table), args.dest)
        print(json.dumps({
            "dest": dest.root,
            "rows": dest.total_records(),
            "files_by_reference": sum(
                1 for e in dest.entries() if os.path.isabs(e.file_path)
            ),
        }))
        return 0

    # maintain
    from olake_spark.checkpoint import MaintenanceLog
    from olake_spark.icelite import Table
    from olake_spark.operators.cluster import run_cluster_rewrite
    from olake_spark.operators.compact import run_compaction
    from olake_spark.operators.expire import run_expire
    from olake_spark.operators.manifests import rewrite_manifests

    if args.table and (args.name or args.uri or args.warehouse):
        # refuse ambiguity instead of silently picking one addressing mode:
        # --table bypasses the catalog CAS, --name routes through it — the
        # operator must get exactly what they asked for
        ap.error("maintain takes EITHER --table (direct root) OR --name "
                 "with --uri/--warehouse (catalog-addressed), not both")
    if args.fleet:
        if args.table or args.name:
            ap.error("maintain --fleet sweeps the whole catalog — it takes "
                     "--uri or --warehouse, not --table/--name")
        if args.ops.strip() != "auto":
            ap.error("maintain --fleet only supports --ops auto (the "
                     "autopilot decides per table)")
        if bool(args.uri) == bool(args.warehouse):
            ap.error("maintain --fleet needs --uri OR --warehouse")
        if args.uri:
            from olake_spark.icelite.restcatalog import RestCatalog

            cat = RestCatalog(spark, args.uri)
        else:
            from olake_spark.icelite import Catalog

            cat = Catalog(spark, args.warehouse)
        from olake_spark.operators.autopilot import report_json, run_fleet

        fleet_log = MaintenanceLog(spark, args.log) if args.log else None
        print(report_json(run_fleet(
            cat, args.job_id, log=fleet_log, execute=not args.dry_run,
            verify=args.verify,
        )))
        return 0
    if args.name:
        if args.uri and args.warehouse:
            ap.error("maintain --name takes --uri OR --warehouse, not both")
        if args.uri:
            from olake_spark.icelite.restcatalog import RestCatalog

            table = RestCatalog(spark, args.uri).load_table(args.name)
        elif args.warehouse:
            from olake_spark.icelite import Catalog

            table = Catalog(spark, args.warehouse).load_table(args.name)
        else:
            ap.error("maintain --name needs --uri or --warehouse")
    elif args.table:
        table = Table.load(spark, args.table)
    else:
        ap.error("maintain needs --table, or --name with --uri/--warehouse")
    log = MaintenanceLog(spark, args.log) if args.log else None
    if args.ops.strip() == "auto":
        # autopilot: inspect health, decide which ops this table needs,
        # run them in dependency order (--dry-run prints the plan only)
        from olake_spark.operators.autopilot import report_json, run_autopilot

        report = run_autopilot(
            table, args.job_id, log=log, execute=not args.dry_run,
            verify=args.verify,
        )
        print(report_json(report))
        return 0
    results: dict = {}
    for op in args.ops.split(","):
        op = op.strip()
        if op == "compact":
            results[op] = run_compaction(
                table, args.job_id, log=log, target_bytes=args.target_bytes,
                verify=args.verify,
            )
        elif op == "cluster":
            results[op] = run_cluster_rewrite(
                table, args.job_id, curve=args.curve, log=log,
                target_bytes=args.target_bytes, verify=args.verify,
            )
        elif op == "manifests":
            results[op] = rewrite_manifests(table, audit=True)
        elif op == "rewrite-deletes":
            from olake_spark.operators.compact import rewrite_position_deletes

            results[op] = rewrite_position_deletes(table)
        elif op == "analyze":
            from olake_spark.operators.analyze import analyze_table

            entry = analyze_table(table)
            results[op] = {
                "snapshot_id": entry["snapshot_id"],
                "row_count": entry["row_count"],
                "columns": len(entry["columns"]),
            }
        elif op == "bloom":
            from olake_spark.icelite.bloom import build_bloom_index

            if not args.bloom_columns:
                print("--ops bloom needs --bloom-columns", file=sys.stderr)
                return 2
            # honor the table's own autopilot.bloom.fpp so a manual run
            # never fpp-flip-flops against the nightly autopilot (a
            # mismatched fpp forces a FULL rebuild, defeating the
            # incremental path both ways)
            fpp = float(
                table.meta["properties"].get("autopilot.bloom.fpp", 0.01)
            )
            results[op] = {}
            for c in args.bloom_columns.split(","):
                idx = build_bloom_index(
                    table, c.strip(), fpp=fpp, incremental=True
                )
                results[op][c.strip()] = {
                    "n_files": idx["n_files"],
                    "n_files_built": idx["n_files_built"],
                    "fpp": fpp,
                }
        elif op == "expire":
            results[op] = run_expire(
                table, keep_last=args.keep_last,
                grace_seconds=args.grace_seconds, job_id=args.job_id, log=log,
            )
        else:
            print(f"unknown op {op!r}", file=sys.stderr)
            return 2
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
