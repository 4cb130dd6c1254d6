"""Upsert/compaction swaps must work on non-plain-path schemes — at
100 TB the lake is an object store, where driver-side ``os``/``shutil``
calls silently no-op. Forcing a ``file:`` URI through the Hadoop Path
API exercises the exact dispatch an ``s3a://``/``abfs://`` path takes
(FileSystem.get by scheme), while staying runnable in this container.
"""

from __future__ import annotations

import os

import pytest

from omop_dump_to_parquet_spark import fs
from omop_dump_to_parquet_spark.plans import upsert_parquet
from omop_dump_to_parquet_spark.sinks import compact_parquet_dir, write_parquet
from omop_dump_to_parquet_spark.sources.parquet import table


def test_fs_helpers_on_file_scheme(spark, tmp_path):
    base = f"file:{tmp_path}"
    assert not fs.exists(spark, f"{base}/nope")
    fs.delete(spark, f"{base}/nope")  # absent is not an error

    os.makedirs(f"{tmp_path}/d1")
    (tmp_path / "d1" / "a.parquet").write_bytes(b"x" * 7)
    assert fs.exists(spark, f"{base}/d1")
    entries = fs.list_entries(spark, f"{base}/d1")
    assert [(e.name, e.is_dir, e.size) for e in entries] == [
        ("a.parquet", False, 7)
    ]

    fs.rename(spark, f"{base}/d1", f"{base}/d2")
    assert not os.path.exists(f"{tmp_path}/d1")
    assert os.path.exists(f"{tmp_path}/d2/a.parquet")

    # Hadoop signals a refused rename by returning false — the wrapper
    # must surface it, not silently drop a swap step. (An existing
    # destination DIRECTORY is not a refusal — Hadoop moves the source
    # inside it, mv-style — the r10 wrapper refuses BOTH cases up
    # front; see test_rename_refuses_existing_destination_directory.)
    (tmp_path / "blocker").write_bytes(b"x")
    with pytest.raises(OSError):
        fs.rename(spark, f"{base}/d2", f"{base}/blocker")

    fs.delete(spark, f"{base}/d2")
    assert not os.path.exists(f"{tmp_path}/d2")


def test_compaction_over_file_scheme_uri(spark, sf_small, tmp_path):
    region = table(spark, sf_small, "region")
    path = f"file:{tmp_path}/many"
    write_parquet(region, path, num_files=6)
    n = compact_parquet_dir(spark, path, target_file_bytes=512 * 1024)
    assert n == 1
    assert spark.read.parquet(path).count() == region.count()
    local = f"{tmp_path}/many"
    assert not os.path.exists(f"{tmp_path}/.many.__compact_tmp")
    assert not os.path.exists(f"{tmp_path}/.many.__compact_old")
    assert os.path.exists(local)


def test_upsert_over_file_scheme_uri(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    region = table(spark, sf_small, "region")
    lake = f"file:{tmp_path}/lake"
    write_parquet(region, lake)
    updates = region.limit(2).withColumn(
        "r_name", F.lit("UPDATED").cast("string")
    )
    n = upsert_parquet(spark, lake, updates, ["r_regionkey"])
    assert n == region.count()
    out = spark.read.parquet(lake)
    assert out.filter(F.col("r_name") == "UPDATED").count() == 2
    local = f"{tmp_path}/lake"
    assert not os.path.exists(f"{local}.__upsert_tmp")
    assert not os.path.exists(f"{local}.__upsert_old")


def test_write_read_text_roundtrip_and_rename_commit(spark, tmp_path):
    """fs.write_text commits via temp-name + rename (no partially
    written marker is ever visible under the final name) and
    read_text returns the exact payload."""
    from omop_dump_to_parquet_spark import fs

    path = f"{tmp_path}/manifest/marker-001"
    fs.write_text(spark, path, '{"rows": 42, "lo": null}')
    assert fs.exists(spark, path)
    assert not fs.exists(spark, f"{path}.inprogress")
    assert fs.read_text(spark, path) == '{"rows": 42, "lo": null}'
    # rewrite path: delete-then-rename — readers see old-or-new (never
    # partial), with an absence window between delete and rename; the
    # marker use case (write-once) never exercises it
    fs.write_text(spark, path, "v2")
    assert fs.read_text(spark, path) == "v2"


def test_read_text_is_byte_faithful(spark, tmp_path):
    """r10 review: the line-based reader stripped trailing newlines
    (and CRs), so write→read was not an inverse. Payloads with every
    terminator style must round-trip exactly."""
    for i, payload in enumerate(
        ["v1\n", "a\r\nb\r\n", "no-terminator", "trailing-blank\n\n"]
    ):
        p = f"file:{tmp_path}/t{i}.txt"
        fs.write_text(spark, p, payload)
        assert fs.read_text(spark, p) == payload, repr(payload)


def test_rename_refuses_existing_destination_directory(spark, tmp_path):
    """r10 review: Hadoop rename into an existing directory 'succeeds'
    by nesting src INSIDE dst — a racing swap step would silently bury
    the lake. The wrapper must refuse instead."""
    import os

    import pytest

    src, dst = tmp_path / "src_dir", tmp_path / "dst_dir"
    src.mkdir()
    (src / "x").write_text("data")
    dst.mkdir()
    with pytest.raises(OSError, match="destination exists"):
        fs.rename(spark, str(src), str(dst))
    assert os.path.exists(src / "x")  # src untouched
    assert not os.path.exists(dst / "src_dir")  # and not nested
