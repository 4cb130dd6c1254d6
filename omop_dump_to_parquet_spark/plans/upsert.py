"""Keyed upsert into the Parquet lake — incremental re-dump.

The reference re-dumps the whole NOTE table every run
(``dump_table.py:94``: ``select * from NOTE``). When the source keeps
growing/changing, the operational need becomes: apply a fresh snapshot
(or CDC batch) of changed rows WITHOUT rewriting 100 TB. Plain Parquet
has no ACID merge, so the engine-level primitive is merge-by-rewrite:

    merged = updates ∪ (current ⟕-anti updates on key)

— updated keys take the new row, unmatched keys keep the old one,
new keys append. The anti-join is key-only until the final projection,
so the shuffle carries keys + row pointers, not payloads, when the
optimizer can prune (CLOB-wide NOTE rows make this matter).

Scale: with a hive/bucket layout, restrict the rewrite to partitions
that actually contain updated keys (partition-pruned anti join) — the
100 TB version rewrites only touched partitions. The swap is the same
atomic-rename recipe as sinks/compact.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..sinks import REFERENCE_SIZING, write_parquet


def upsert_parquet(
    spark: SparkSession,
    lake_path: str,
    updates: DataFrame,
    key_cols: list[str],
    max_records_per_file: int = REFERENCE_SIZING["rows_per_file"],
) -> int:
    """Merge ``updates`` into the lake at ``lake_path`` by key.

    Returns the merged row count. Updates win on key collision; the
    rewrite is verified for schema equality and swapped in atomically
    (readers see old or new, never a mix).
    """
    current = spark.read.parquet(lake_path)
    if current.schema != updates.schema:
        raise ValueError(
            f"upsert schema mismatch: {current.schema.simpleString()} "
            f"vs {updates.schema.simpleString()}"
        )
    kept = current.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = updates.unionByName(kept)

    tmp = f"{lake_path}.__upsert_tmp"
    write_parquet(merged, tmp, max_records_per_file=max_records_per_file)
    n = spark.read.parquet(tmp).count()
    old = f"{lake_path}.__upsert_old"
    os.rename(lake_path, old)
    os.rename(tmp, lake_path)
    shutil.rmtree(old)
    return n
