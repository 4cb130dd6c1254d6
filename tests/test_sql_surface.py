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


def test_w22_rolling_median_matches_pandas(spark, sf_small):
    """Exact windowed median equals pandas' rolling median for every
    user (same frame, same order)."""
    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.operators.windows import W22_FRAME
    from omop_dump_to_parquet_spark.sources.parquet import table

    queries, _ = load_catalog()
    got = queries["w22_rolling_median"](spark, sf_small).toPandas()
    ev = (
        table(spark, sf_small, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["want"] = (
        ev.groupby("user_id")["value"]
        .rolling(W22_FRAME, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
        .round(6)
    )
    merged = got.merge(ev[["event_id", "want"]], on="event_id")
    assert len(merged) == len(ev)
    assert (merged["rolling_median"] == merged["want"]).all()


def test_m08_framing_overlap_and_features(spark, sf_small):
    """50%-overlap framing: frame f starts at f*hop; interior bytes
    are covered by exactly 2 frames; energy/peak match a pure-Python
    recompute for the first document."""
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.operators.multimodal import (
        M08_FRAME,
        M08_HOP,
    )
    from omop_dump_to_parquet_spark.sources.parquet import table

    queries, _ = load_catalog()
    rows = queries["m08_audio_framing"](spark, sf_small).collect()
    # a doc long enough to produce overlapping frames
    doc = (
        table(spark, sf_small, "documents")
        .filter(F.length("text") > M08_HOP)
        .orderBy("doc_id")
        .first()
    )
    b = doc["text"].encode()
    mine = sorted(
        (r for r in rows if r["doc_id"] == doc["doc_id"]),
        key=lambda r: r["frame_idx"],
    )
    assert len(mine) == len(range(0, len(b), M08_HOP))
    for r in mine:
        c = b[r["off"] : r["off"] + M08_FRAME]
        assert r["flen"] == len(c)
        assert r["energy"] == sum(c)
        assert r["peak"] == max(c)
    # overlap: byte at hop (interior) belongs to frames 0 and 1
    assert mine[0]["off"] == 0 and mine[1]["off"] == M08_HOP
    assert mine[1]["off"] < mine[0]["off"] + M08_FRAME
