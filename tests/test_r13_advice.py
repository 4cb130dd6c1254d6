"""Regression tests for the r12 advisor notes applied in r13 plus
d14 invariants (the new catalog id certifying the k-means SemDeDup
path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_kmeans_exact_fails_loud_on_short_embedding(spark):
    """The posexplode means rebuild must raise — not silently leave a
    centroid coordinate at the 0.0 placeholder — when a cluster's
    (cluster, pos) rows don't cover every dimension (r12 advisor: the
    old 64-column wide form failed loudly via float(None); the
    posexplode rewrite's setdefault fill did not)."""
    from omop_dump_to_parquet_spark.operators.similarity import kmeans_exact

    # one cluster (k=1) whose only members are 3-element arrays while
    # dim=4: position 3 never appears in the posexplode, so the fill
    # check must trip
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [2.0, 1.0, 0.5])],
        "vec_id long, emb array<double>",
    )
    with pytest.raises(ValueError, match="mean rows"):
        kmeans_exact(emb, k=1, iters=1, dim=4)


def test_kmeans_exact_requires_dense_ids(spark):
    from omop_dump_to_parquet_spark.operators.similarity import kmeans_exact

    emb = spark.createDataFrame(
        [(3, [1.0, 2.0]), (7, [2.0, 1.0])],
        "vec_id long, emb array<double>",
    )
    with pytest.raises(ValueError, match="dense vec_ids"):
        kmeans_exact(emb, k=2, iters=1, dim=2)


def test_d14_buckets_match_s07_contract_and_prune_is_within_bucket(
    spark, sf_small
):
    """d14's clusters must be exactly the kmeans_exact assignment (the
    oracle derives them independently via unrolled CTEs), and every
    (keeper, removed) pair must be a same-bucket pair with
    keeper < removed — the SemDeDup within-cluster contract."""
    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.functions.vectors import to_double_array
    from omop_dump_to_parquet_spark.operators.dedup import D14_ITERS, D14_K
    from omop_dump_to_parquet_spark.operators.similarity import kmeans_exact
    from omop_dump_to_parquet_spark.sources.parquet import table

    queries, _ = load_catalog()
    out = queries["d14_semdedup_kmeans"](spark, sf_small).collect()
    assert out, "fixture should produce at least one pruned vector"

    emb = table(spark, sf_small, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    assigned, _ = kmeans_exact(emb, D14_K, D14_ITERS)
    bucket_of = {
        r["vec_id"]: r["cluster"]
        for r in assigned.select("vec_id", "cluster").collect()
    }
    for r in out:
        assert r["keeper_id"] < r["removed_id"]
        assert bucket_of[r["keeper_id"]] == bucket_of[r["removed_id"]]
