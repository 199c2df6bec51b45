"""File-backed table catalog — Iceberg's HadoopCatalog shape: a warehouse
directory where `<warehouse>/<namespace>/<table>/metadata/` IS the catalog
entry (no central registry file, so listing/creation need no extra CAS —
the table's own versioned metadata commit remains the only linearization
point).

The reference wires four catalog backends (glue/rest/jdbc/hive,
destination/iceberg/iceberg_utils.go:197-260) behind one interface; those
services don't exist in this environment, so the filesystem catalog is the
honest analogue — the same role HadoopCatalog plays in Iceberg itself.

Identifiers are ``"namespace.table"`` (one level) or bare ``"table"`` in
the ``default`` namespace.

Semantics mirrored from HadoopCatalog:
  * ``create_table`` is atomic: `Table.create`'s O_EXCL metadata write is
    the commit — two racing creates cannot both win.
  * ``drop_table(purge=False)`` un-catalogs but preserves bytes (a
    ``dropped.marker`` file makes the entry invisible to listings/loads
    while the tree stays intact); ``purge=True`` removes the tree.
  * ``rename_table`` is supported only on POSIX filesystems (one atomic
    directory rename); on object-store FileIO it REFUSES, exactly like
    HadoopCatalog's UnsupportedOperationException — an object-store rename
    is a non-atomic copy+delete per key, and a half-renamed table is a
    corrupt catalog.
"""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from .clone import snapshot_table
from .fileio import FileIO, LocalFileIO, default_io
from .table import Table

_DROP_MARKER = "dropped.marker"


class NoSuchTableError(KeyError):
    pass


class TableAlreadyExistsError(FileExistsError):
    pass


def split_identifier(identifier: str) -> tuple[str, str]:
    """``"ns.table"`` or bare ``"table"`` (default namespace)."""
    parts = identifier.split(".")
    if len(parts) == 1:
        return "default", parts[0]
    if len(parts) == 2:
        return parts[0], parts[1]
    raise ValueError(f"identifier must be [ns.]table: {identifier!r}")


def check_not_reserved(identifier: str) -> tuple[str, str]:
    ns, name = split_identifier(identifier)
    if ns.startswith("_") or name.startswith("_"):
        raise ValueError(f"reserved identifier: {identifier!r}")
    return ns, name


class Catalog:
    def __init__(self, spark, warehouse: str, io: FileIO | None = None):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        self.io = io or default_io()
        self.io.makedirs(self.warehouse)

    # ------------------------------------------------------------ identity

    _split = staticmethod(split_identifier)

    def _path(self, identifier: str) -> str:
        ns, name = check_not_reserved(identifier)
        return os.path.join(self.warehouse, ns, name)

    @staticmethod
    def _is_table_dir(path: str) -> bool:
        # the drop marker outranks the hint: a direct-path writer's commit
        # re-writes version-hint.text (Table._write_hint), which must NOT
        # resurrect a dropped catalog entry
        meta = os.path.join(path, "metadata")
        return os.path.exists(
            os.path.join(meta, "version-hint.text")
        ) and not os.path.exists(os.path.join(meta, _DROP_MARKER))

    # ----------------------------------------------------------------- DDL

    def create_table(
        self, identifier: str, schema: StructType, **create_kwargs
    ) -> Table:
        path = self._path(identifier)
        if self._is_table_dir(path):
            raise TableAlreadyExistsError(identifier)
        if os.path.exists(os.path.join(path, "metadata", _DROP_MARKER)):
            # soft-dropped: bytes (and old metadata versions) still live at
            # the path, so a fresh create would collide with v0 metadata —
            # and even if it won, the marker would keep the new table
            # invisible. Refuse with the actionable fix instead of letting
            # Table.create surface an opaque FileExistsError.
            raise TableAlreadyExistsError(
                f"{identifier}: identifier was dropped without purge — its "
                "data is preserved on disk. drop_table(purge=True) it (or "
                "move the directory aside) before re-creating."
            )
        return Table.create(
            self.spark, path, schema, io=self.io, **create_kwargs
        )

    def load_table(self, identifier: str) -> Table:
        path = self._path(identifier)
        if not self._is_table_dir(path):
            raise NoSuchTableError(identifier)
        return Table.load(self.spark, path, io=self.io)

    def table_exists(self, identifier: str) -> bool:
        return self._is_table_dir(self._path(identifier))

    def list_namespaces(self) -> list[str]:
        try:
            names = self.io.list_dir(self.warehouse)
        except FileNotFoundError:
            return []
        return sorted(
            n for n in names
            if not n.startswith("_")
            and os.path.isdir(os.path.join(self.warehouse, n))
        )

    def list_tables(self, namespace: str = "default") -> list[str]:
        ns_dir = os.path.join(self.warehouse, namespace)
        try:
            names = self.io.list_dir(ns_dir)
        except FileNotFoundError:
            return []
        return sorted(
            f"{namespace}.{n}"
            for n in names
            if self._is_table_dir(os.path.join(ns_dir, n))
        )

    def register_table(self, identifier: str, root: str) -> "Table":
        """HadoopCatalog parity: a filesystem catalog derives the table
        PATH from the identifier, so an arbitrary existing root cannot be
        registered — exactly why Iceberg's register_table procedure is
        unsupported on HadoopCatalog. Use the REST catalog
        (`catalog --serve` / `RestCatalog.register_table`) or
        `snapshot_table` for a zero-copy import into the warehouse."""
        raise NotImplementedError(
            "register_table is not supported on the filesystem catalog "
            "(the path IS the identifier — HadoopCatalog parity); use the "
            "REST catalog or snapshot_table"
        )

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        """purge=True removes the tree; purge=False un-catalogs but
        preserves every byte — ONE atomic single-key marker write
        (``metadata/dropped.marker``), which both FileIO flavors support
        (no directory move, which object stores don't have). The marker
        outranks the version hint so a direct-path commit (which re-writes
        the hint) cannot resurrect the entry; re-creating the identifier
        requires a purge first."""
        path = self._path(identifier)
        if not self._is_table_dir(path):
            raise NoSuchTableError(identifier)
        if purge:
            self.io.rmtree(path)
            return
        # a marker, not a hint move: Table._commit re-writes the hint on
        # every direct-path commit, so hint absence alone would not be a
        # durable un-catalog
        self.io.write_text_atomic(
            os.path.join(path, "metadata", _DROP_MARKER), identifier
        )

    def rename_table(self, src: str, dst: str) -> Table:
        if not isinstance(self.io, LocalFileIO):
            raise NotImplementedError(
                "rename_table requires an atomic directory rename; object "
                "stores have none (copy+delete per key would leave a "
                "half-renamed catalog on failure) — HadoopCatalog refuses "
                "this the same way. Clone + drop instead."
            )
        spath, dpath = self._path(src), self._path(dst)
        if not self._is_table_dir(spath):
            raise NoSuchTableError(src)
        if self._is_table_dir(dpath):
            raise TableAlreadyExistsError(dst)
        self.io.makedirs(os.path.dirname(dpath))
        os.rename(spath, dpath)
        return self.load_table(dst)

    def snapshot_table(self, src: str, dst: str) -> Table:
        """Zero-copy clone `src` into a NEW catalog table `dst` (Iceberg's
        snapshot procedure, catalog-addressed)."""
        dpath = self._path(dst)
        if self._is_table_dir(dpath):
            raise TableAlreadyExistsError(dst)
        return snapshot_table(self.load_table(src), dpath, io=self.io)
