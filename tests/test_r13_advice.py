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


def _skewed_docs(spark):
    """800-doc corpus, source sizes 500/200/80/20 — the skew the
    uniform sf fixtures cannot exercise."""
    rows = []
    did = 0
    for src, n in (("big", 500), ("mid", 200), ("small", 80), ("tiny", 20)):
        for _ in range(n):
            rows.append((did, src))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_quotas_flatten_by_temperature():
    from omop_dump_to_parquet_spark.operators.pipeline import mixture_quotas

    counts = {"big": 500, "mid": 200, "small": 80, "tiny": 20}
    q = mixture_quotas(counts, rate=0.2)
    budget = int(0.2 * sum(counts.values()))
    assert sum(q.values()) <= budget  # floor rounding never overshoots
    assert all(q[s] <= counts[s] for s in counts)
    # temperature T=0.5 flattens: smaller sources get a strictly
    # higher sampling RATE than larger ones
    rates = {s: q[s] / counts[s] for s in counts}
    assert rates["tiny"] > rates["small"] > rates["mid"] > rates["big"]
    # and the quota ratio tracks sqrt(n) ratio, not n ratio
    assert q["big"] / q["tiny"] < counts["big"] / counts["tiny"]


def test_p07_epochs_upsample_small_sources(spark, tmp_path):
    """With a 2x corpus budget, the temperature-flattened targets give
    small sources MORE epochs per doc than large ones, every doc of
    every source appears, and per-source totals equal the integer
    targets exactly."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = _skewed_docs(spark).toPandas()
    docs["text"] = "x"
    docs["lang"] = "en"
    docs["n_chars"] = 1
    pq.write_table(pa.Table.from_pandas(docs), str(tmp_path / "documents.parquet"))

    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.operators.pipeline import P07_RATE

    queries, _ = load_catalog()
    out = (
        queries["p07_mixture_upsample"](spark, str(tmp_path))
        .groupBy("source")
        .count()
        .collect()
    )
    totals = {r["source"]: r["count"] for r in out}
    counts = {"big": 500, "mid": 200, "small": 80, "tiny": 20}
    r = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in counts.items()}
    budget = math.floor(P07_RATE * sum(counts.values()))
    tgt = {s: (budget * r[s]) // sum(r.values()) for s in counts}
    assert totals == tgt
    epochs_per_doc = {s: totals[s] / counts[s] for s in counts}
    assert (
        epochs_per_doc["tiny"]
        > epochs_per_doc["small"]
        > epochs_per_doc["mid"]
        > epochs_per_doc["big"]
    )


def test_mixture_threshold_draw_equals_window_path(spark, sf_small, tmp_path):
    """The two-pass threshold draw (the 100 TB skew posture) must keep
    EXACTLY the window path's doc set — on the driver fixture and on
    the skewed corpus, at two histogram granularities (prefix_len 1
    exercises multi-bucket boundaries, 2 the sliver regime)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.operators.pipeline import (
        mixture_quotas,
        mixture_threshold_draw,
    )
    from omop_dump_to_parquet_spark.sources.parquet import table

    queries, _ = load_catalog()

    skewed = _skewed_docs(spark).toPandas()
    skewed["text"] = "x"
    skewed["lang"] = "en"
    skewed["n_chars"] = 1
    pq.write_table(
        pa.Table.from_pandas(skewed), str(tmp_path / "documents.parquet")
    )

    for sf_dir in (sf_small, str(tmp_path)):
        docs = table(spark, sf_dir, "documents")
        counts = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        quotas = mixture_quotas(counts)
        want = {
            (r["doc_id"], r["source"])
            for r in queries["p06_temperature_mixture_sample"](
                spark, sf_dir
            ).collect()
        }
        for plen in (1, 2):
            got = {
                (r["doc_id"], r["source"])
                for r in mixture_threshold_draw(docs, quotas, plen).collect()
            }
            assert got == want, (sf_dir, plen, len(got), len(want))


def test_mixture_quotas_properties_hypothesis():
    """Property test over arbitrary source-count maps: quotas never
    exceed source size, never overshoot the budget, are monotone in
    source size (a bigger source never gets a smaller quota), and are
    insensitive to dict insertion order (the determinism contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from omop_dump_to_parquet_spark.operators.pipeline import mixture_quotas

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4),
            st.integers(min_value=1, max_value=10_000_000),
            min_size=1,
            max_size=30,
        ),
        st.floats(min_value=0.01, max_value=1.0),
    )
    def check(counts, rate):
        import math

        q = mixture_quotas(counts, rate=rate)
        assert set(q) == set(counts)
        assert all(0 <= q[s] <= counts[s] for s in counts)
        assert sum(q.values()) <= math.floor(rate * sum(counts.values()))
        ordered = sorted(counts, key=counts.__getitem__)
        for a, b in zip(ordered, ordered[1:]):
            if counts[a] == counts[b]:
                assert q[a] == q[b]
        # insertion-order insensitivity
        rev = dict(reversed(list(counts.items())))
        assert mixture_quotas(rev, rate=rate) == q
        # monotone: strictly bigger source never gets a smaller quota
        for a in counts:
            for b in counts:
                if counts[a] < counts[b]:
                    assert q[a] <= q[b]

    check()
