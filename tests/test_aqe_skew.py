"""AQE runtime behaviors the 100 TB story leans on: skew-join
splitting and post-shuffle partition coalescing. Asserted on the
FINAL adaptive plan (after execution), because that is where AQE's
decisions become visible."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, pairs):
    old = {}
    for k, v in pairs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only on execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_join_splits_hot_key(spark):
    """One key holding ~97% of rows: AQE must mark the sort-merge join
    skew-split instead of leaving one straggler task."""
    hot = spark.range(200_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    rest = spark.range(6_000).select(
        (F.col("id") % 64 + 1).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionAll(rest)
    right = spark.range(65).select(
        F.col("id").alias("k"), F.lit("dim").alias("name")
    )
    with _confs(
        spark,
        {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # shrink thresholds so the tiny fixture is "skewed"
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        j = left.join(right, "k")
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]


def test_post_shuffle_partitions_coalesce(spark):
    """32 static shuffle partitions over a tiny aggregate: AQE coalesces
    to far fewer real partitions (AQEShuffleRead coalesced)."""
    df = spark.range(10_000).groupBy((F.col("id") % 7).alias("g")).count()
    plan = _final_plan(df)
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan, plan[:2000]
