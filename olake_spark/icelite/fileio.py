"""FileIO: the storage abstraction under icelite's metadata layer.

The reference splits catalog (linearization: who wins a commit) from file IO
(bytes: S3FileIO / HadoopFileIO), configured independently
(destination/iceberg/iceberg_utils.go:197-260). icelite collapses both into
one small interface — every metadata-side filesystem touch the Table makes
goes through it, so porting to an object store / catalog service means
implementing ONE class, not editing the engine:

- `LocalFileIO` (default): POSIX. The commit linearization point is
  `os.link` O_EXCL — exactly one writer materializes a given metadata
  version, atomically, across processes.
- `ConditionalPutFileIO`: models a store whose conditional create is served
  by the storage/catalog endpoint itself (S3 `If-None-Match: *` conditional
  PUT, or a REST catalog's compare-and-swap): the put-if-absent decision is
  made under the store's own serialization, no hard links required. The
  in-process lock stands in for the remote endpoint's serialization; it is
  NOT multi-process-safe on plain POSIX — that is what LocalFileIO is for.

Data-plane reads/writes (Spark parquet jobs, pyarrow manifest IO) stay
path-based: Spark and pyarrow already speak s3a/hdfs/gs URLs natively, so
the engine needs no shim there — only the metadata-side create/list/rename
calls, which object stores service differently from POSIX.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid
from typing import Iterator


class FileIO:
    """Metadata-side storage interface. All paths are absolute strings."""

    def atomic_create_json(self, target: str, meta: dict) -> bool:
        """Create `target` holding `meta`, atomically: observers see either
        no file or the COMPLETE file, and exactly one concurrent caller
        returns True. This is the commit linearization point."""
        raise NotImplementedError

    def write_text_atomic(self, path: str, data: str) -> None:
        """Overwrite `path` with `data` atomically (advisory files: hints)."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        """Yield absolute paths of every file under `root` (recursive) —
        the object-store analogue is a prefix listing."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def getmtime(self, path: str) -> float:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation; `os.link` O_EXCL is the commit CAS."""

    def atomic_create_json(self, target: str, meta: dict) -> bool:
        # write the full content to a temp file, then publish it with one
        # link syscall: a concurrent reader can never observe a partial
        # write, and an existing winner makes the link fail
        tmp = os.path.join(os.path.dirname(target), f".commit-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirs, files in os.walk(root):
            for name in files:
                yield os.path.join(dirpath, name)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)


class ConditionalPutFileIO(LocalFileIO):
    """Put-if-absent served by the (simulated) store endpoint instead of a
    POSIX hard link — the S3-conditional-PUT / REST-catalog CAS shape. Every
    FileIO method except the linearization point inherits the local
    implementation, mirroring how S3FileIO reuses plain reads/writes and
    only the catalog commit differs."""

    _lock = threading.Lock()  # stands in for the remote endpoint's serialization

    def atomic_create_json(self, target: str, meta: dict) -> bool:
        data = json.dumps(meta)
        with ConditionalPutFileIO._lock:
            if os.path.exists(target):
                return False
            tmp = os.path.join(
                os.path.dirname(target), f".put-{uuid.uuid4().hex}"
            )
            with open(tmp, "w") as f:
                f.write(data)
            os.replace(tmp, target)  # "PUT succeeded": object appears whole
            return True
