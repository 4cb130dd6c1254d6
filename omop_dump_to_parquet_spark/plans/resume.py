"""Resumable chunked dump — restartable ingestion with a completion
manifest.

The reference's single server-side cursor (``dump_table.py:81-111``)
has a brutal operational property at scale: ANY failure at row
1,999,999,999 of a 2-billion-row dump restarts from row zero — there
is no record of what already landed. This plan splits the dump into
key-range chunks, writes each chunk to its own subdirectory, and
marks completion with a commit marker written ONLY after the chunk's
data is fully on disk. A re-run:

- skips every chunk whose marker exists (the work is durable),
- deletes and re-dumps any chunk directory WITHOUT a marker (a
  partial write from the crashed attempt — removing it makes the
  retry idempotent),
- verifies the reassembled lake (count conservation per chunk and
  total, schema stability) exactly like the one-shot dump.

Exactly-once lands as "at-least-once attempts + idempotent chunk
replacement + atomic-marker commit" — the same recipe the streaming
twin uses per micro-batch (plans/stream_dump.py) and foreachBatch
upsert uses per batch (st07), applied to batch backfill.

The chunk loop runs on the driver, bounded by ``n_chunks`` — the
legitimate shape for restartable orchestration (each iteration is a
full parallel Spark job; the loop is control flow, not data flow).
All path operations go through the Hadoop FileSystem API (fs.py), so
the identical code serves file:, HDFS and object stores.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fs
from ..sinks import REFERENCE_SIZING, write_parquet

MANIFEST_DIR = "_dump_manifest"


def _marker_path(output_path: str, chunk: int) -> str:
    return f"{output_path}/{MANIFEST_DIR}/chunk-{chunk:05d}"


def _touch(spark: SparkSession, path: str, payload: str) -> None:
    """Create a small marker file atomically enough for a manifest:
    write to a temp name, then Hadoop-rename into place (rename is
    atomic on HDFS/file:, and create-if-absent on object stores)."""
    tmp = f"{path}.inprogress"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(tmp)
    hfs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = hfs.create(jpath, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    fs.rename(spark, tmp, path)


def _read_marker(spark: SparkSession, path: str) -> int:
    """Row count recorded in a commit marker."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    hfs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = hfs.open(jpath)
    try:
        data = []
        b = stream.read()
        while b >= 0:
            data.append(b)
            b = stream.read()
        return int(bytes(data).decode("utf-8"))
    finally:
        stream.close()


@dataclass
class ResumableDumpResult:
    rows_written: int
    chunks_total: int
    chunks_skipped: int  # already committed by a previous attempt
    chunks_dumped: int
    chunk_rows: dict[int, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.rows_written == sum(self.chunk_rows.values())


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

    ``[lower, upper]`` is the inclusive key range of
    ``partition_col`` (≙ the JDBC reader's lowerBound/upperBound —
    at a real 100 TB dump each chunk filter is pushed into the
    source as a WHERE range on an indexed key, so a chunk re-run
    re-reads only that range, never the table).

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

        if fs.exists(spark, marker):
            chunk_rows[i] = _read_marker(spark, marker)
            total_rows += chunk_rows[i]
            skipped += 1
            continue

        # no marker: anything in the chunk dir is a torn write from a
        # previous attempt — drop it so the retry is idempotent
        fs.delete(spark, chunk_dir)

        part = source.filter(
            (F.col(partition_col) >= lo) & (F.col(partition_col) <= hi)
        )
        from pyspark.sql import Observation

        obs = Observation(f"chunk_{i}")
        observed = part.observe(obs, F.count(F.lit(1)).alias("n"))
        write_parquet(
            observed, chunk_dir, max_records_per_file=max_records_per_file
        )
        n = int(obs.get["n"])
        # data is durable; NOW commit the marker (crash between write
        # and marker → chunk is re-dumped, which is safe because the
        # retry deletes the unmarked dir first)
        _touch(spark, marker, str(n))
        chunk_rows[i] = n
        total_rows += n
        dumped += 1

        if fail_after_chunk is not None and dumped >= fail_after_chunk:
            raise RuntimeError(
                f"simulated crash after {dumped} chunks (test hook)"
            )

    return ResumableDumpResult(
        rows_written=total_rows,
        chunks_total=n_chunks,
        chunks_skipped=skipped,
        chunks_dumped=dumped,
        chunk_rows=chunk_rows,
    )
