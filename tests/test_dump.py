"""The reference pipeline's golden properties (SURVEY.md §5):
count conservation, schema stability, shard sizing."""

from __future__ import annotations

from omop_dump_to_parquet_spark.plans import dump_table
from omop_dump_to_parquet_spark.sources.parquet import table
from omop_dump_to_parquet_spark.verify import count_conserved


def test_dump_conserves_counts_and_schema(spark, sf_small, tmp_path):
    src = table(spark, sf_small, "lineitem")
    out = str(tmp_path / "lineitem_dump")
    result = dump_table(
        spark, src, out, max_records_per_file=1000, num_files=4
    )
    assert result.rows_written == src.count() == 6000
    assert result.report.count_matches
    assert result.report.schema_matches
    assert result.report.max_file_rows <= 1000
    assert result.report.n_files >= 6  # 6000 rows / 1000-cap
    assert count_conserved(spark, src, out)


def test_dump_row_limit(spark, sf_small, tmp_path):
    """row_limit ≙ the reference's DEFAULT_N_TO_FETCH cap
    (dump_table.py:24-28)."""
    src = table(spark, sf_small, "orders")
    out = str(tmp_path / "orders_capped")
    result = dump_table(spark, src, out, row_limit=500)
    assert result.rows_written == 500
    assert result.report.ok


def test_dump_normalize_cast(spark, sf_small, tmp_path):
    """casts ≙ the reference's PROVIDER_ID Int64 repair
    (dump_table.py:145-146)."""
    src = table(spark, sf_small, "nation")
    out = str(tmp_path / "nation_cast")
    result = dump_table(spark, src, out, casts={"n_nationkey": "long"})
    assert result.report.ok
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["n_nationkey"] == "bigint"


def test_schema_drift_detection(spark, sf_small):
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.verify import schema_drift

    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    assert schema_drift(nation.schema, nation.schema) == []
    drifted = (
        nation.drop("n_name")
        .withColumn("n_regionkey", F.col("n_regionkey").cast("string"))
        .withColumn("extra", F.lit(1))
    )
    drift = schema_drift(nation.schema, drifted.schema)
    assert any(d.startswith("added column: extra") for d in drift)
    assert any(d.startswith("dropped column: n_name") for d in drift)
    assert any(d.startswith("type change: n_regionkey") for d in drift)
    assert len(drift) == 3
