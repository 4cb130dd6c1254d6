"""The reference program, end to end, as a Spark pipeline.

Reference ``main`` (``dump_table.py:175-252``):
  count source → size the fetch target → pin schema → stream/buffer/
  flush loop → final flush → read-back verification.

Spark pipeline:
  read (any source) → optional limit → normalize casts (pinned
  schema) → sized parquet write → verify (count + schema + sizing).

The buffer/flush machinery (``dump_table.py:207-233``) has no
counterpart: tasks stream rows straight into the Parquet writer with
bounded memory, in parallel. The progress callback
(``dump_table.py:109-110``) maps to ``df.observe`` metrics here so the
row count is captured by the very same job that writes — no second
scan of the source.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..sinks import REFERENCE_SIZING, write_parquet
from ..sources.jdbc import normalize
from ..verify import VerifyReport, verify_parquet


@dataclass
class DumpResult:
    rows_written: int
    report: VerifyReport

    @property
    def ok(self) -> bool:
        return self.report.ok


def dump_table(
    spark: SparkSession,
    source: DataFrame,
    output_path: str,
    row_limit: int | None = None,
    casts: dict[str, str] | None = None,
    max_records_per_file: int = REFERENCE_SIZING["rows_per_file"],
    num_files: int | None = None,
) -> DumpResult:
    """Ingest → normalize → write → verify (reference semantics).

    ``row_limit`` ≙ ``DEFAULT_N_TO_FETCH``/``GRAB_EVERYTHING``
    (``dump_table.py:24-28,194-197``); ``casts`` ≙ the PROVIDER_ID
    Int64 repair (``dump_table.py:145-146``); verification ≙
    ``dump_table.py:235-248``.
    """
    df = source
    if row_limit is not None:
        df = df.limit(row_limit)
    df = normalize(df, casts or {})

    obs = Observation("dump_rows")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    write_parquet(
        observed,
        output_path,
        max_records_per_file=max_records_per_file,
        num_files=num_files,
    )
    rows_written = int(obs.get["n"])

    report = verify_parquet(
        spark,
        output_path,
        expected_count=rows_written,
        expected_schema=df.schema,
        max_records_per_file=max_records_per_file,
    )
    return DumpResult(rows_written=rows_written, report=report)
