"""Small-files compaction — the lake maintenance pass.

Streaming ingest (plans/stream_dump), hive partitioning, and per-task
sharding all create files far below the reference's deliberate
~500k-row shards (``dump_table.py:182-183``); at 100 TB the resulting
file-listing and task-scheduling overhead dominates scan time long
before I/O does. Compaction rewrites a directory to files near a
target byte size, preserving row count and schema (the reference's
O10 conservation contract), and verifies before replacing anything.

Sizing uses the ACTUAL on-disk bytes (driver-side listing — file
metadata only, never data), not a rows×width guess, so compressed
width variation is accounted for. The rewrite is a plain
repartition-and-write to a sibling directory followed by an atomic
rename — readers see the old layout or the new one, never a mix.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from .parquet_sink import write_parquet

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one comfortable scan split


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_bother: int = 2,
) -> int:
    """Rewrite ``path`` into ≈``total_bytes/target_file_bytes`` files.

    Returns the new file count (or the current one if no compaction
    was needed). Verifies count conservation on the rewrite before
    swapping it in; the old layout is kept as ``path`` until the swap.

    Hive-partitioned lakes (``path/col=value/…``) are compacted
    per partition directory — each leaf keeps its partition-pruning
    layout and only its own files are rewritten.

    Swap caveat (same as plans/upsert.py): a directory cannot be
    replaced atomically on a plain filesystem; the two-rename window
    is preceded by stale-state cleanup so crashed runs never wedge
    the next one, and a crash mid-swap leaves the data recoverable
    under ``.__compact_old``.
    """
    entries = os.listdir(path)
    subdirs = [
        os.path.join(path, d)
        for d in entries
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if subdirs:  # hive layout: recurse into each partition directory
        return sum(
            compact_parquet_dir(
                spark, d, target_file_bytes, min_files_to_bother
            )
            for d in subdirs
        )
    for stale in (f"{path}.__compact_tmp", f"{path}.__compact_old"):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    files = [
        os.path.join(path, f) for f in entries if f.endswith(".parquet")
    ]
    if len(files) < min_files_to_bother:
        return len(files)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(1, round(total_bytes / target_file_bytes))
    if n_target >= len(files):
        return len(files)  # already at or below target sizes

    df = spark.read.parquet(path)
    expected = df.count()
    tmp = f"{path}.__compact_tmp"
    write_parquet(df, tmp, num_files=n_target)
    actual = spark.read.parquet(tmp).count()
    if actual != expected:  # conservation violated — keep the original
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch: {actual} != {expected}"
        )
    old = f"{path}.__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_target
