"""Partitioned JDBC ingestion — the reference's core, generalized.

The reference streams one table through a single server-side cursor
(``dump_table.py:81-111``: ``cursor.fetchmany(chunk_size)`` with a
``FETCH FIRST :n ROWS ONLY`` cap, ``dump_table.py:94,99``) on exactly
one connection (``dump_table.py:41-45``) — its scalability ceiling.

Spark's JDBC source subsumes every piece of that design:

- server-side cursor streaming  → ``fetchsize`` (≙ ``chunk_size``,
  reference default 2048, ``dump_table.py:184``);
- bounded memory ("never load the whole table", ``dump_table.py:82-93``)
  → the executor iterates the ResultSet, nothing is materialized;
- LIMIT pushdown (``dump_table.py:94``) → Catalyst pushes ``.limit(n)``
  into the generated query (``pushDownLimit``);
- the single-connection ceiling → ``partitionColumn``/``lowerBound``/
  ``upperBound``/``numPartitions`` fan the scan across executors, one
  connection per partition;
- schema probing via a 10-row sample (``dump_table.py:116-148``) →
  unnecessary: the JDBC reader derives the schema from database
  metadata without fetching rows; ``custom_schema`` covers dialect
  over-widening (the reference's PROVIDER_ID fight,
  ``dump_table.py:144-146``).

At 100 TB the source DB, not Spark, is the bottleneck: pick
``num_partitions`` to match what the database can serve concurrently
(tens, not thousands) and land the data in Parquet once; all analytics
run on the lake, never the OLTP store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 2048  # reference chunk_size, dump_table.py:184


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    dbtable: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = DEFAULT_FETCH_SIZE,
    custom_schema: str | None = None,
    row_limit: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a relational table as a (optionally partitioned) DataFrame.

    ``row_limit`` reproduces the reference's ``DEFAULT_N_TO_FETCH`` cap
    (``dump_table.py:24-28``); Catalyst pushes it into the remote query.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if custom_schema:
        reader = reader.option("customSchema", custom_schema)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if row_limit is not None:
        df = df.limit(row_limit)
    return df


def normalize(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Pin the schema with explicit casts — the reference's
    infer-once-then-freeze semantics (``dump_table.py:145-146,203``)
    reduced to one declarative ``select``. E.g.
    ``normalize(df, {"PROVIDER_ID": "long"})``.
    """
    if not casts:
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
    )


def write_jdbc_table(
    df: DataFrame,
    url: str,
    dbtable: str,
    mode: str = "append",
    batch_size: int = DEFAULT_FETCH_SIZE,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame back to a relational table (lake → DB).

    The inverse of :func:`read_jdbc_table` — curated/aggregated lake
    results served back to an operational store. Each partition opens
    one connection and inserts in ``batchsize`` batches (the write-side
    twin of the reference's ``fetchmany(chunk_size)`` streaming,
    ``dump_table.py:105-111``). ``num_partitions`` caps concurrent
    connections — at scale the DB is the bottleneck: repartition DOWN
    to what it can absorb, never fan out to executor count.
    """
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
