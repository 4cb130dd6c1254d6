"""The SQL API surface: after register_lake, Spark itself must run
ANSI SQL over the views — proven by executing a sample of the
catalog's own oracle_sql() strings ON SPARK and matching the
DataFrame-API results. (DuckDB usually runs those strings; running
them on Spark shows the two APIs are one engine.)
"""

from __future__ import annotations

import pytest

from omop_dump_to_parquet_spark import load_catalog
from omop_dump_to_parquet_spark.sql import register_lake, sql

QUERIES, ORACLES = load_catalog()

# Oracles written in the ANSI subset both engines parse (the rest use
# DuckDB-only list_* / string_split functions).
ANSI_ORACLE_SAMPLE = [
    "q01_pricing_summary",
    "q08_agg_multi",
    "q10_rollup",
    "q25_shipping_priority",
    "q30_local_supplier_volume",
]


def test_register_lake_is_idempotent(spark, sf_small):
    views = register_lake(spark, sf_small)
    views2 = register_lake(spark, sf_small)
    assert views == views2
    assert sql(spark, "SELECT COUNT(*) AS n FROM region").collect()[0]["n"] == 5


@pytest.mark.parametrize("name", ANSI_ORACLE_SAMPLE)
def test_oracle_sql_runs_on_spark_and_matches_dataframe_api(
    spark, sf_small, name
):
    register_lake(spark, sf_small)
    via_sql = sql(spark, ORACLES[name])
    via_df = QUERIES[name](spark, sf_small)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert via_sql.count() == via_df.count()
    # exact row-set equality (bag semantics)
    assert via_sql.exceptAll(via_df.select(*via_sql.columns)).count() == 0
