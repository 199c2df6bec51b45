"""WebDataset-style tar shard sink: the standard trainer input format.

Large-scale image/caption training loaders (WebDataset, NVIDIA DALI,
torchdata) consume POSIX tar archives where each sample is a run of
adjacently-stored files sharing a basename (``<id>.png`` + ``<id>.txt``
— the LAION distribution format). This module writes the engine's
curated (image, caption) batches as those shards, one tar per group —
the terminal stage after quality rules → dedup → aspect bucketing →
batch packing.

Determinism contract: shard names are pure functions of their group key;
members are stored in a declared order (default: the packer's
``batch_idx, slot`` coordinates) with zeroed tar metadata (mtime/uid/gid,
fixed mode), so re-running the sink over the same input produces
byte-identical archives — the manifest's sha256 makes that checkable,
and retries/speculative tasks are idempotent by construction (tmp +
atomic rename, last writer wins with identical bytes).

Scale shape: one ``applyInPandas`` over the group key — each task holds
exactly one group's payload bytes, so choose ``group_cols`` to bound
task memory (the default, the packer's full batch coordinates, is the
smallest unit; group by (bucket, shard) for fewer/larger shards and
raise ``n_shards`` upstream to compensate). The manifest returned to the
driver is one row per shard — metadata, never payload.

Writes land executor-side via tmp + ``os.replace`` — correct on every
POSIX filesystem a Spark cluster mounts (local, NFS, Lustre, fuse). An
object-store deployment plugs a put-object call into ``_emit``, the one
seam that touches storage.

Reference parity: the reference engine ships sync output as
Iceberg/parquet only (SURVEY.md §2 S15/S16); the tar sink belongs to
this repo's LLM-data-pipeline layer, per the assignment's
training-data-pipeline scope.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

__all__ = ["write_webdataset_shards"]


def _shard_name(group_cols: tuple[str, ...], key: tuple) -> str:
    # group values become path components: keep them filesystem-safe
    # (a string key like 'image/png' must not create directories)
    def safe(v) -> str:
        return "".join(
            ch if (ch.isalnum() or ch in "._-") else "_" for ch in str(v)
        )

    return "shard-" + "-".join(
        f"{c}={safe(v)}" for c, v in zip(group_cols, key)
    ) + ".tar"


def _emit(out_dir: str, name: str, data: bytes) -> str:
    """tmp + atomic rename; identical-bytes retries are harmless."""
    final = os.path.join(out_dir, name)
    tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, final)
    return final


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "image_id",
    files: dict[str, str] | None = None,
    group_cols: tuple[str, ...] = ("bucket_w", "bucket_h", "shard",
                                   "batch_idx"),
    order_cols: tuple[str, ...] | None = None,
    index: bool = False,
) -> DataFrame:
    """Write one deterministic tar shard per ``group_cols`` group and
    return the manifest (group key columns + path, n_samples, n_members,
    n_missing, n_bytes, sha256).

    ``files`` maps member extension → source column (default
    ``{"png": "bytes", "txt": "caption"}``); a NULL payload skips that
    member (counted in ``n_missing``) — WebDataset treats absent
    extensions as optional fields. ``order_cols`` fixes the sample order
    inside each shard (default ``("batch_idx", "slot")`` when the packer
    columns are present, else the id column); ties always break on the
    id, making the member order total. String payloads are UTF-8
    encoded; binary payloads pass through.

    ``index=True`` also writes a ``<shard>.tar.idx`` sidecar — one
    ``<member-name> <payload-offset> <size>`` line per member (the
    NVIDIA-DALI/wids random-access shape: seek to the offset and read
    ``size`` bytes without walking tar headers). Offsets point at the
    payload, i.e. 512 bytes past the member's USTAR header."""
    files = files or {"png": "bytes", "txt": "caption"}
    cols = set(df.columns)
    missing = [c for c in (*group_cols, id_col, *files.values())
               if c not in cols]
    if missing:
        raise ValueError(f"missing columns: {missing}")
    if order_cols is None:
        order_cols = tuple(
            c for c in ("batch_idx", "slot") if c in cols
        ) or (id_col,)
    os.makedirs(out_dir, exist_ok=True)

    key_fields = [df.schema[c] for c in group_cols]
    manifest = StructType(
        key_fields
        + [
            StructField("path", StringType()),
            StructField("n_samples", LongType()),
            StructField("n_members", LongType()),
            StructField("n_missing", LongType()),
            StructField("n_bytes", LongType()),
            StructField("sha256", StringType()),
        ]
    )
    exts = list(files.items())  # declared order = member order per sample

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [*order_cols, id_col], kind="mergesort"
        ).reset_index(drop=True)
        buf = io.BytesIO()
        n_members = n_missing = 0
        idx_lines = []
        ids = pdf[id_col].to_numpy()
        payloads = {ext: pdf[col].to_numpy() for ext, col in exts}
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tar:
            for i in range(len(pdf)):
                base = str(ids[i])
                for ext, _ in exts:
                    val = payloads[ext][i]
                    if val is None or (isinstance(val, float) and
                                       pd.isna(val)):
                        n_missing += 1
                        continue
                    data = (val.encode("utf-8") if isinstance(val, str)
                            else bytes(val))
                    name = f"{base}.{ext}"
                    # header is written at the current offset; payload
                    # starts one 512-byte USTAR header block later
                    idx_lines.append(
                        f"{name} {tar.offset + 512} {len(data)}"
                    )
                    ti = tarfile.TarInfo(name=name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    ti.mode = 0o644
                    tar.addfile(ti, io.BytesIO(data))
                    n_members += 1
        data = buf.getvalue()
        name = _shard_name(group_cols, key)
        path = _emit(out_dir, name, data)
        if index:
            _emit(out_dir, f"{name}.idx",
                  ("\n".join(idx_lines) + "\n").encode())
        return pd.DataFrame([{
            **{c: k for c, k in zip(group_cols, key)},
            "path": path,
            "n_samples": len(pdf),
            "n_members": n_members,
            "n_missing": n_missing,
            "n_bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest(),
        }])

    needed = list(dict.fromkeys(
        [*group_cols, id_col, *order_cols, *files.values()]
    ))
    return (
        df.select(*needed)
        .groupBy(*[F.col(c) for c in group_cols])
        .applyInPandas(pack, manifest)
    )
