"""Parquet lake access.

The reference's output product is a directory of sharded Parquet files
(``dump_table.py:156-157,221-233``); this module is the read side of
that product plus the driver fixture tables. Reads are plain
``spark.read.parquet`` so Catalyst applies predicate pushdown, column
pruning, and (on partitioned layouts) partition pruning — visible as
``PushedFilters``/``ReadSchema`` in ``.explain("formatted")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at each scale factor (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to HARD-broadcast at ANY scale
#: factor — TPC-H `region`/`nation` are fixed-cardinality (5/25 rows)
#: even at 100 TB. `supplier` GROWS with scale factor (10k rows/SF),
#: so it gets no hard hint: `spark.sql.autoBroadcastJoinThreshold` /
#: AQE decide per-run whether it still fits.
BROADCAST_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    This is the single choke point that canonicalizes fixture dtypes so
    the whole catalog can assume ``events.ts: timestamp`` (TIMESTAMP_LTZ)
    regardless of how the driver happened to write the parquet. Layouts
    seen across rounds:

    * TIMESTAMP(NANOS) read as a nanosecond ``bigint`` under
      ``spark.sql.legacy.parquet.nanosAsLong`` — truncate-divide to
      micros (same conversion DuckDB applies reading ns parquet as its
      us-native TIMESTAMP, so differential oracles agree).
    * ``timestamp[us]`` with ``isAdjustedToUTC=false``, which Spark
      reads as TIMESTAMP_NTZ — cast to TIMESTAMP. The session pins UTC
      (session.py), so NTZ→LTZ is value-preserving and ``unix_micros``
      et al. see the same instants DuckDB does.
    * ``timestamp[us]`` already adjusted to UTC (plain TIMESTAMP) —
      passes through untouched.

    If the driver ships a FOURTH layout, add its branch HERE (and in
    the streaming twin ``streaming/stream_queries._events_stream``),
    never at call sites — every operator assumes this contract.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dtypes.get("ts") == "timestamp_ntz":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ts_us(col="ts"):
    """Event time as an epoch-microsecond long.

    Every catalog operator that needs arithmetic on ``events.ts`` goes
    through this helper rather than calling ``F.unix_micros`` directly,
    so if the driver ships yet another timestamp layout that ``table()``
    misses, the failure surfaces at one definition instead of N call
    sites. ``unix_micros`` requires TIMESTAMP (not NTZ) — ``table()``
    guarantees that; the analysis error otherwise names this function.

    Known failure signatures of a NEW unhandled layout (fix
    ``table()``, not the call site):

    * ``CANNOT_RESOLVE ... unix_micros(ts) ... TIMESTAMP_NTZ`` — a new
      not-UTC-adjusted physical type slipped past the ntz branch;
    * ``DATATYPE_MISMATCH ... "ts" is of bigint type`` from a window /
      range frame — an integer-encoded layout at a different unit
      (seconds/millis); extend the bigint branch with the right
      divisor, and keep the truncate-divide (DuckDB truncates too).
    """
    from pyspark.sql import functions as F

    return F.unix_micros(col if not isinstance(col, str) else F.col(col))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once; defaults to all of them."""
    use = names or FIXTURE_TABLES
    return {n: table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for SQL-API operators."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


def read_lake(
    spark: SparkSession, *paths: str, merge_schema: bool = False
) -> DataFrame:
    """Read one or more Parquet lake locations as a single DataFrame.

    ``merge_schema=True`` turns on ADDITIVE SCHEMA EVOLUTION: shards
    written by an older dump generation (fewer columns) and a newer
    one (added nullable columns) read as one table with the union
    schema, pre-evolution rows NULL in the new columns — the standard
    Parquet-lake contract (every shard's footer carries its own
    schema; Spark unions them at planning time). A user of the
    reference hits this the first time a source table grows a column
    between dump runs (the reference itself would just start writing
    differently-shaped files into the same directory and break the
    next read).

    Off by default, deliberately: footer merging costs a planning
    pass over EVERY file footer, which at 100 TB (millions of shards)
    is a driver-side scan you should not pay on schema-stable lakes —
    the reference's own contract is a pinned schema (``verify.py``
    enforces it per dump). Turn it on only while a lake is
    mid-migration, then compact (``sinks/compact.py``) back to one
    schema.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)
