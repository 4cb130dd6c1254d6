"""Resumable chunked dump — restartable ingestion with a completion
manifest.

The reference's single server-side cursor (``dump_table.py:81-111``)
has a brutal operational property at scale: ANY failure at row
1,999,999,999 of a 2-billion-row dump restarts from row zero — there
is no record of what already landed. This plan splits the dump into
key-range chunks, writes each chunk to its own subdirectory, and
marks completion with a commit marker written ONLY after the chunk's
data is fully on disk. A re-run:

- validates every existing marker against ITS OWN recorded range and
  parameters (markers are self-describing JSON) and fails fast if the
  resume was invoked with different chunking — silently mixing two
  chunk layouts would duplicate and drop rows;
- skips every chunk whose marker matches (the work is durable);
- re-dumps any chunk without a marker — ``write_parquet``'s overwrite
  mode replaces the chunk directory wholesale, so a torn write from
  the crashed attempt is cleared by the rewrite itself;
- verifies the reassembled lake by READ-BACK: the union of chunk
  directories must count exactly the rows the markers claim
  (the one-shot dump's count-conservation check, plans/dump.py).

Coverage: the FIRST chunk is unbounded below (and owns NULL keys) and
the LAST is unbounded above — the same convention as Spark's JDBC
partitioning — so no source row can fall outside every chunk even
when ``lower``/``upper`` came from a stale min/max estimate.

Exactly-once lands as "at-least-once attempts + idempotent chunk
replacement + atomic-marker commit" — the same recipe the streaming
twin uses per micro-batch (plans/stream_dump.py) and foreachBatch
upsert uses per batch (st07), applied to batch backfill.

The chunk loop runs on the driver, bounded by ``n_chunks`` — the
legitimate shape for restartable orchestration (each iteration is a
full parallel Spark job; the loop is control flow, not data flow).
All path/manifest operations go through fs.py's Hadoop FileSystem
wrappers, so the identical code serves file:, HDFS and object stores.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fs
from ..sinks import REFERENCE_SIZING, write_parquet

MANIFEST_DIR = "_dump_manifest"


def _marker_path(output_path: str, chunk: int) -> str:
    return f"{output_path}/{MANIFEST_DIR}/chunk-{chunk:05d}"


@dataclass
class ResumableDumpResult:
    rows_written: int
    read_back_rows: int
    chunks_total: int
    chunks_skipped: int  # already committed by a previous attempt
    chunks_dumped: int
    chunk_rows: dict[int, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        """Count conservation, proven by read-back (not bookkeeping):
        the reassembled lake must contain exactly the rows the chunk
        markers claim."""
        return self.read_back_rows == self.rows_written


def dump_table_resumable(
    spark: SparkSession,
    source: DataFrame,
    output_path: str,
    partition_col: str,
    lower: int,
    upper: int,
    n_chunks: int = 8,
    max_records_per_file: int = REFERENCE_SIZING["rows_per_file"],
    fail_after_chunk: int | None = None,
) -> ResumableDumpResult:
    """Dump ``source`` into ``n_chunks`` key-range chunks with
    restartable progress.

    ``[lower, upper]`` seeds the chunk boundaries the way the JDBC
    reader's lowerBound/upperBound seed its partitions — and with the
    same semantics: boundaries SPLIT the key space, they do not
    FILTER it. The first chunk takes everything ≤ its high bound
    (including NULL keys) and the last everything ≥ its low bound, so
    stale bounds skew chunk sizes but can never lose rows.

    ``fail_after_chunk`` is a TEST hook: raise after committing that
    many chunks, simulating a mid-dump crash so tests can assert the
    resume behavior.
    """
    span = upper - lower + 1
    per = max(1, span // n_chunks)
    skipped = dumped = total_rows = 0
    chunk_rows: dict[int, int] = {}

    for i in range(n_chunks):
        lo = lower + i * per
        hi = upper if i == n_chunks - 1 else lo + per - 1
        chunk_dir = f"{output_path}/chunk={i:05d}"
        marker = _marker_path(output_path, i)

        first, last = i == 0, i == n_chunks - 1
        expect = {
            "chunk": i,
            "partition_col": partition_col,
            "lo": None if first else lo,
            "hi": None if last else hi,
            "n_chunks": n_chunks,
        }

        if fs.exists(spark, marker):
            recorded = json.loads(fs.read_text(spark, marker))
            mismatch = {
                k: (recorded.get(k), v)
                for k, v in expect.items()
                if recorded.get(k) != v
            }
            if mismatch:
                raise ValueError(
                    f"resume parameter mismatch on {marker}: a previous "
                    f"attempt used different chunking {mismatch}; resuming "
                    "with a new layout over old markers would duplicate "
                    "and drop rows — use a fresh output_path or the "
                    "original parameters"
                )
            chunk_rows[i] = int(recorded["rows"])
            total_rows += chunk_rows[i]
            skipped += 1
            continue

        # Split-not-filter bounds: edge chunks are unbounded so the
        # union of chunks covers every source row; NULL keys ride the
        # first chunk (the JDBC-partitioning convention).
        key = F.col(partition_col)
        if first and last:
            cond = F.lit(True)
        elif first:
            cond = (key <= hi) | key.isNull()
        elif last:
            cond = key >= lo
        else:
            cond = (key >= lo) & (key <= hi)
        part = source.filter(cond)

        from pyspark.sql import Observation

        obs = Observation(f"chunk_{i}")
        observed = part.observe(obs, F.count(F.lit(1)).alias("n"))
        # mode="overwrite" replaces the chunk directory wholesale —
        # this is the torn-write cleanup: an unmarked dir from a
        # crashed attempt is simply rewritten.
        write_parquet(
            observed,
            chunk_dir,
            mode="overwrite",
            max_records_per_file=max_records_per_file,
        )
        n = int(obs.get["n"])
        # data is durable; NOW commit the self-describing marker
        fs.write_text(spark, marker, json.dumps({**expect, "rows": n}))
        chunk_rows[i] = n
        total_rows += n
        dumped += 1

        if fail_after_chunk is not None and dumped >= fail_after_chunk:
            raise RuntimeError(
                f"simulated crash after {dumped} chunks (test hook)"
            )

    # Read back with the SOURCE schema supplied: a zero-row chunk
    # writes a directory with no data files, and if every chunk is
    # empty (empty source / degenerate bounds) schema inference over
    # the glob would error instead of reporting a trivially-conserved
    # zero-row dump.
    read_back = (
        spark.read.schema(source.schema)
        .parquet(f"{output_path}/chunk=*")
        .count()
    )
    return ResumableDumpResult(
        rows_written=total_rows,
        read_back_rows=read_back,
        chunks_total=n_chunks,
        chunks_skipped=skipped,
        chunks_dumped=dumped,
        chunk_rows=chunk_rows,
    )
