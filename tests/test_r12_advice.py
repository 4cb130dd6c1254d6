"""Regression tests for the two r11-advice fixes (round 12), plus the
round's s07 plan rewrite.

1. zorder: a ±Infinity value in the data must not become a derived
   quantization bound (an infinite span sends every finite row to
   bucket 0 — the NaN dimension-collapse failure mode, degraded
   rather than thrown); caller-supplied inf bounds are guarded too.
2. scale_rehearsal: an op-filtered refresh must not erase the prior
   SCALE_REHEARSAL.json rows of unlisted relational ops — the rebuilt
   block merges per-op over the prior file's block.
3. s07: the posexplode update step is value-identical to the r11
   64-column decimal-agg formulation (same exact-DECIMAL mean, round
   9 — checked against the registered oracle by the parity sweep;
   here we pin the plan-shape contract: one decimal agg, bounded
   512-row driver collect).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _deinterleave(key: int, d: int, bits: int, n_dims: int = 2) -> int:
    return sum(((key >> (n_dims * i + d)) & 1) << i for i in range(bits))


def test_zorder_inf_in_data_without_bounds_degrades_gracefully(spark):
    """No caller bounds + a +inf in the column: max() returns inf,
    which pre-fix made the span infinite and quantized every FINITE
    row to bucket 0. Non-finite values are now excluded from the
    stats aggregation, so finite values keep their real bounds; the
    inf row clamps to the top edge bucket per the out-of-range
    policy."""
    from omop_dump_to_parquet_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [
            (0, 1.0, 10.0),
            (1, float("inf"), 20.0),
            (2, 3.0, 30.0),
            (3, float("-inf"), 40.0),
        ],
        "id bigint, x double, y double",
    )
    bits = 8
    out = df.select(
        "id", zorder_key(df, ["x", "y"], bits=bits).alias("zk")
    ).collect()
    hi = (1 << (bits * 2)) - 1
    assert all(0 <= r["zk"] <= hi for r in out)

    by_id = {r["id"]: r["zk"] for r in out}
    max_q = (1 << bits) - 1
    # x (dim 0): bounds come from the FINITE values {1.0, 3.0} —
    # pre-fix both quantized to 0 (infinite span)
    assert _deinterleave(by_id[0], 0, bits) == 0
    assert _deinterleave(by_id[2], 0, bits) == max_q
    # the inf rows clamp to the edges instead of throwing under ANSI
    assert _deinterleave(by_id[1], 0, bits) == max_q
    assert _deinterleave(by_id[3], 0, bits) == 0
    # y (dim 1) clusters normally despite x's non-finite rows
    ys = [_deinterleave(by_id[i], 1, bits) for i in (0, 1, 2, 3)]
    assert ys == sorted(ys) and ys[0] < ys[3]


def test_zorder_caller_supplied_inf_bounds_collapse_not_throw(spark):
    """Caller-supplied (lo=-inf / hi=inf / NaN) bounds must be guarded
    like derived ones: the dimension degrades to constant instead of
    an inf span reaching the quantization arithmetic."""
    from omop_dump_to_parquet_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, 2.0, 20.0)], "id bigint, x double, y double"
    )
    bits = 8
    out = df.select(
        "id",
        zorder_key(
            df,
            ["x", "y"],
            bits=bits,
            bounds={"x": (float("-inf"), float("inf")), "y": (10.0, 30.0)},
        ).alias("zk"),
    ).collect()
    hi = (1 << (bits * 2)) - 1
    by_id = {r["id"]: r["zk"] for r in out}
    assert all(0 <= v <= hi for v in by_id.values())
    # x collapsed to a constant dim (guarded), y still clusters
    assert _deinterleave(by_id[0], 0, bits) == _deinterleave(
        by_id[1], 0, bits
    )
    assert _deinterleave(by_id[0], 1, bits) < _deinterleave(
        by_id[1], 1, bits
    )


def test_rehearsal_filtered_refresh_preserves_unlisted_rel_ops(tmp_path):
    """An op-filtered rel refresh (only q48 measured) must keep q31's
    prior step-pair rows — pre-fix the rebuilt block shadowed the
    prior file and the setdefault merge could never restore it."""
    from scale_rehearsal import _merged_rel_ops

    prior = {
        "relational_x10_extension": {
            "note": "prior",
            "ops": {
                "q31_array_map_funcs": {"x1": {"sec": 1.0}, "step_alpha": 0.5},
                "q48_theta_error_bound": {"x1": {"sec": 9.9}},
            },
        }
    }
    path = str(tmp_path / "SCALE_REHEARSAL.json")
    with open(path, "w") as fh:
        json.dump(prior, fh)

    fresh = {"q48_theta_error_bound": {"x1": {"sec": 2.0}, "step_alpha": 0.7}}
    merged = _merged_rel_ops(path, fresh)
    # unlisted op preserved verbatim, listed op overlaid with the
    # fresh measurement
    assert merged["q31_array_map_funcs"]["step_alpha"] == 0.5
    assert merged["q48_theta_error_bound"]["step_alpha"] == 0.7
    # no prior file → just this run's ops
    assert _merged_rel_ops(str(tmp_path / "missing.json"), fresh) == fresh


def test_seq_dot_bit_identical_to_spark_fold(spark):
    """_seq_dot (the driver-side |c|² precompute) must be the exact
    IEEE left-fold dot_d evaluates — any reassociation (fsum, numpy,
    pairwise) would shift the rounded distance key on boundary values
    and break the oracle lockstep."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.functions.vectors import dot_d
    from omop_dump_to_parquet_spark.operators.similarity import _seq_dot

    finite = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )

    @given(st.lists(finite, min_size=1, max_size=32))
    @settings(max_examples=20, deadline=None)
    def check(vec):
        df = spark.createDataFrame([(vec,)], "v array<double>")
        got = df.select(dot_d(F.col("v"), F.col("v")).alias("d")).first()["d"]
        assert struct.pack("d", got) == struct.pack("d", _seq_dot(vec, vec))

    check()


def _blob_emb(spark, n_per: int = 20, dim: int = 8):
    """Two well-separated Gaussian-free blobs (deterministic offsets):
    any sane clustering must split them."""
    rows = []
    for i in range(n_per):
        rows.append((i, [1.0 + 0.001 * i] * dim))
        rows.append((100 + i, [-1.0 - 0.001 * i] * dim))
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def test_kmeans_bucket_assign_separates_blobs_deterministically(spark):
    from omop_dump_to_parquet_spark.operators.similarity import (
        kmeans_bucket_assign,
    )

    emb = _blob_emb(spark)
    a = kmeans_bucket_assign(emb, 2, iters=3)
    rows = a.collect()
    assert len(rows) == 40
    by_blob = {}
    for r in rows:
        assert 0 <= r["bucket"] < 2
        by_blob.setdefault(r["vec_id"] >= 100, set()).add(r["bucket"])
    # each blob lands in exactly one bucket, and not the same one
    assert all(len(v) == 1 for v in by_blob.values())
    assert by_blob[False] != by_blob[True]
    # deterministic rerun
    b = kmeans_bucket_assign(emb, 2, iters=3)
    assert (
        a.select("vec_id", "bucket")
        .exceptAll(b.select("vec_id", "bucket"))
        .count()
        == 0
    )


def test_kmeans_2level_ids_disjoint_and_deterministic(spark):
    from omop_dump_to_parquet_spark.operators.similarity import (
        kmeans_bucket_assign_2level,
    )

    emb = _blob_emb(spark)
    a = kmeans_bucket_assign_2level(emb, 4, iters=2)
    rows = a.collect()
    assert len(rows) == 40
    # k_coarse=2, k_fine=2 → bucket ids in [0, 4); the two blobs never
    # share a bucket (they cannot share a coarse cell)
    blob_buckets = {False: set(), True: set()}
    for r in rows:
        assert 0 <= r["bucket"] < 4
        blob_buckets[r["vec_id"] >= 100].add(r["bucket"])
    assert not (blob_buckets[False] & blob_buckets[True])
    b = kmeans_bucket_assign_2level(emb, 4, iters=2)
    assert (
        a.select("vec_id", "bucket")
        .exceptAll(b.select("vec_id", "bucket"))
        .count()
        == 0
    )


def test_semdedup_prune_bucketed_single_bucket_is_brute_force(spark):
    """With every vector in ONE bucket, the bucketed prune must equal
    the brute-force all-pairs min-keeper at the same threshold."""
    import itertools
    import math as m

    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.operators.dedup import (
        semdedup_prune_bucketed,
    )

    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.9999, 0.01, 0.0],
        2: [0.0, 1.0, 0.0],
        3: [0.0, 0.9999, 0.01],
        4: [0.577, 0.577, 0.577],
    }
    tau = 0.99
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, emb array<double>, bucket long",
    )
    got = {
        r["removed_id"]: (r["keeper_id"], r["max_cos_sim"])
        for r in semdedup_prune_bucketed(df, tau).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            m.sqrt(sum(x * x for x in a)) * m.sqrt(sum(x * x for x in b))
        )

    want: dict[int, tuple[int, float]] = {}
    for i, j in itertools.combinations(sorted(vecs), 2):
        c = round(cos(vecs[i], vecs[j]), 6)
        if c >= tau:
            keep, sim = want.get(j, (j + 1, -2.0))
            want[j] = (min(keep, i), max(sim, c))
    assert got == want


def test_s07_update_step_matches_wide_decimal_agg(spark):
    """The posexplode update step must reproduce the r11 wide
    formulation's per-dimension means bit-for-bit (exact DECIMAL sums
    are summation-order independent, so the two shapes are the same
    arithmetic)."""
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.functions.deterministic import davg

    dim = 5
    rows = [
        (0, [float(i + j) / 7.0 for j in range(dim)]) for i in range(9)
    ] + [(1, [math.sin(i + j) for j in range(dim)]) for i in range(7)]
    df = spark.createDataFrame(rows, "cluster long, emb array<double>")

    wide = df.groupBy("cluster").agg(
        *[
            F.round(davg(F.element_at(F.col("emb"), d + 1), 38, 18), 9).alias(
                f"m{d}"
            )
            for d in range(dim)
        ]
    )
    wide_means = {
        int(r["cluster"]): [float(r[f"m{d}"]) for d in range(dim)]
        for r in wide.collect()
    }

    tall = (
        df.select("cluster", F.posexplode("emb").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.round(davg(F.col("x"), 38, 18), 9).alias("m"))
    )
    tall_means: dict[int, list[float]] = {}
    for r in tall.collect():
        tall_means.setdefault(int(r["cluster"]), [0.0] * dim)[
            int(r["pos"])
        ] = float(r["m"])

    assert tall_means == wide_means
