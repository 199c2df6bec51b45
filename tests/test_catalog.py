"""File-backed catalog (HadoopCatalog shape) tests."""

import os

import pytest

from olake_spark import datagen
from olake_spark.icelite import LocalFileIO, Table
from olake_spark.icelite.catalog import (Catalog, NoSuchTableError,
                                         TableAlreadyExistsError)
from olake_spark.icelite.fileio import FakeObjectStoreFileIO


@pytest.fixture()
def cat(spark, tmp_table_dir):
    return Catalog(spark, os.path.join(tmp_table_dir, "wh"))


def test_create_load_list(spark, cat):
    t = cat.create_table("raw.images", datagen.IMAGES_SCHEMA,
                         identifier_fields=("image_id",))
    t.append(datagen.gen_images_df(spark, 30))
    assert cat.table_exists("raw.images")
    assert cat.list_tables("raw") == ["raw.images"]
    assert "raw" in cat.list_namespaces()
    assert cat.load_table("raw.images").scan().count() == 30
    # bare name → default namespace
    cat.create_table("scratch", datagen.IMAGES_SCHEMA)
    assert cat.list_tables() == ["default.scratch"]


def test_create_conflicts_and_missing(spark, cat):
    cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    with pytest.raises(TableAlreadyExistsError):
        cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    with pytest.raises(NoSuchTableError):
        cat.load_table("a.nope")
    with pytest.raises(ValueError):
        cat.load_table("_dropped.x")


def test_drop_without_purge_preserves_bytes(spark, cat):
    t = cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    t.append(datagen.gen_images_df(spark, 10))
    root = t.root
    cat.drop_table("a.t")
    assert not cat.table_exists("a.t")
    assert cat.list_tables("a") == []
    # bytes preserved: direct-path access still works (un-cataloged,
    # not destroyed — Iceberg drop-without-purge semantics)
    assert Table.load(spark, root).scan().count() == 10
    # the dir stays occupied (bytes preserved) — purge frees the name,
    # and the refusal says so (not an opaque FileExistsError from v0
    # metadata collision)
    with pytest.raises(TableAlreadyExistsError, match="dropped without purge"):
        cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    # durability: a direct-path writer's commit re-writes the version hint
    # — the drop must survive it (marker outranks hint)
    Table.load(cat.spark, root).append(datagen.gen_images_df(cat.spark, 3))
    assert not cat.table_exists("a.t")
    assert cat.list_tables("a") == []


def test_drop_purge_removes_tree(spark, cat):
    t = cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    t.append(datagen.gen_images_df(spark, 5))
    cat.drop_table("a.t", purge=True)
    assert not os.path.exists(t.root)
    cat.create_table("a.t", datagen.IMAGES_SCHEMA)  # name reusable


def test_rename_local_only(spark, tmp_table_dir):
    # pin LocalFileIO: under OLAKE_FILEIO=objectstore the default-io catalog
    # correctly refuses rename, which is the second half of this test
    cat = Catalog(spark, os.path.join(tmp_table_dir, "wh"), io=LocalFileIO())
    t = cat.create_table("a.t", datagen.IMAGES_SCHEMA)
    t.append(datagen.gen_images_df(spark, 12))
    t2 = cat.rename_table("a.t", "b.t2")
    assert not cat.table_exists("a.t")
    assert t2.scan().count() == 12
    assert cat.list_tables("b") == ["b.t2"]
    # object-store catalogs refuse rename (HadoopCatalog parity)
    oc = Catalog(
        spark, os.path.join(tmp_table_dir, "wh2"),
        io=FakeObjectStoreFileIO(),
    )
    oc.create_table("a.t", datagen.IMAGES_SCHEMA)
    with pytest.raises(NotImplementedError, match="atomic directory rename"):
        oc.rename_table("a.t", "a.t3")


def test_catalog_snapshot_table(spark, cat):
    t = cat.create_table("prod.imgs", datagen.IMAGES_SCHEMA,
                         identifier_fields=("image_id",))
    t.append(datagen.gen_images_df(spark, 25))
    c = cat.snapshot_table("prod.imgs", "dev.imgs")
    assert c.scan().count() == 25
    assert cat.list_tables("dev") == ["dev.imgs"]
    with pytest.raises(TableAlreadyExistsError):
        cat.snapshot_table("prod.imgs", "dev.imgs")
