"""Spark SQL surface over the lake.

The DataFrame catalog (operators/) and this module are two views of
the same engine: ``register_lake`` exposes every fixture/lake table as
a temp view, after which any ANSI-SQL query — including each
``oracle_sql()`` string the DuckDB harness runs — executes on Spark
itself via ``spark.sql``. Catalyst treats view-backed SQL and
DataFrame plans identically (same pushdown, pruning, AQE), so there
is no performance tier between the two APIs; a user of the reference
who only speaks SQL switches by calling two functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs
from .sources.parquet import FIXTURE_TABLES, table


def register_lake(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = FIXTURE_TABLES,
) -> list[str]:
    """Register each lake table as a temp view named after the table.
    Idempotent (replaces existing views); returns the view names."""
    apply_runtime_confs(spark)
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(tables)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ANSI SQL against the registered views (thin passthrough —
    exists so callers depend on this package's session conventions,
    not on raw ``spark.sql``)."""
    apply_runtime_confs(spark)
    return spark.sql(query)
