"""Regression tests for the four r10-advice fixes (round 11).

One test per advisor finding, each constructed to FAIL on the
pre-fix code:

1. q31 oracle: ``map_total`` must floor fractional quantities like
   every other column (truncate-vs-round divergence on drift).
2. q48: an EMPTY events input must yield the oracle's ``0/TRUE``,
   not ``NULL/NULL`` (the r10 sum() rewrite lost the empty case).
3. zorder: caller-supplied bounds narrower than the data must CLAMP
   out-of-range (and NaN) values instead of throwing from an ANSI
   out-of-range double→long cast.
4. compact: root-level crash markers written under the legacy
   plain-sibling naming (``path.__compact_old``) must still be
   restored / cleaned after upgrading to the dot-prefixed naming.
"""

from __future__ import annotations

import glob
import os

import duckdb

from omop_dump_to_parquet_spark import load_catalog

QUERIES, ORACLES = load_catalog()


def _mini_sf(spark, tmp_path, tables: dict) -> str:
    """Write {name: DataFrame} as a fixture-shaped sf directory."""
    sf = str(tmp_path / "sf_mini")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/{name}.parquet")
    return sf


def _duck_on(sf: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    return con


def test_q31_oracle_floors_fractional_quantities(spark, tmp_path):
    """On FRACTIONAL quantities (where truncate != round: x.5 rounds
    up under DuckDB round-half-away but floors down), every q31
    column — including map_total, the one the r10 fix missed — must
    agree between the Spark plan and the DuckDB oracle."""
    li = spark.createDataFrame(
        [
            (1, 1.5),  # floor 1, DuckDB CAST-round 2 → the divergence
            (1, 2.5),
            (2, 3.5),
            (2, 1.0),
        ],
        "l_orderkey bigint, l_quantity double",
    )
    sf = _mini_sf(spark, tmp_path, {"lineitem": li})
    spark_rows = {
        r["l_orderkey"]: r.asDict()
        for r in QUERIES["q31_array_map_funcs"](spark, sf).collect()
    }
    con = _duck_on(sf, ["lineitem"])
    try:
        duck = con.sql(ORACLES["q31_array_map_funcs"]).df()
    finally:
        con.close()
    assert len(duck) == len(spark_rows) == 2
    for _, d in duck.iterrows():
        s = spark_rows[d["l_orderkey"]]
        for col in ("qty_csv", "n_items", "has_single", "qty_total",
                    "first3_csv", "map_total"):
            assert s[col] == d[col], (col, s[col], d[col])
        # and map_total is the FLOORED total (1+2=3 for order 1), not
        # the rounded one (2+3=5) — pins the semantics, not just parity
    assert spark_rows[1]["map_total"] == 3
    assert spark_rows[1]["qty_total"] == 3


def test_q48_empty_events_matches_oracle_zero_true(spark, tmp_path):
    """q48 on an EMPTY events table: oracle emits one (0, TRUE) row;
    the Spark side must too (pre-fix: NULL/NULL from the global sum)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(0)
    sf = _mini_sf(spark, tmp_path, {"events": ev})
    rows = QUERIES["q48_theta_error_bound"](spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_overlap_exact"] == 0
    assert rows[0]["within_eps"] is True
    con = _duck_on(sf, ["events"])
    try:
        duck = con.sql(ORACLES["q48_theta_error_bound"]).df()
    finally:
        con.close()
    assert int(duck["n_overlap_exact"][0]) == 0
    assert bool(duck["within_eps"][0]) is True


def test_zorder_clamps_out_of_range_and_nan_with_caller_bounds(spark):
    """Caller-supplied bounds NARROWER than the data: far-out values
    and NaN must clamp to edge buckets (docstring contract), not
    throw from the ANSI double→long cast (pre-fix behavior)."""
    from omop_dump_to_parquet_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [
            (0, 50.0, 50.0),        # inside the bounds
            (1, 1.0e18, 50.0),      # far above hi → top edge bucket
            (2, -1.0e18, 50.0),     # far below lo → bottom edge bucket
            (3, float("nan"), 50.0),  # NaN → NULL-policy bottom bucket
            (4, None, 50.0),        # NULL → bottom bucket
        ],
        "id bigint, x double, y double",
    )
    bits = 8
    bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    out = {
        r["id"]: r["zk"]
        for r in df.select(
            "id", zorder_key(df, ["x", "y"], bits=bits, bounds=bounds).alias("zk")
        ).collect()  # pre-fix: throws CAST_OVERFLOW here under ANSI
    }
    hi = (1 << (bits * 2)) - 1
    assert all(0 <= v <= hi for v in out.values())

    def deinterleave_x(key):  # x occupies even bit positions (d=0)
        return sum(((key >> (2 * i)) & 1) << i for i in range(bits))

    max_q = (1 << bits) - 1
    assert deinterleave_x(out[1]) == max_q  # clamped to top bucket
    assert deinterleave_x(out[2]) == 0      # clamped to bottom bucket
    assert deinterleave_x(out[3]) == 0      # NaN follows the NULL policy
    assert deinterleave_x(out[4]) == 0
    assert 0 < deinterleave_x(out[0]) < max_q


def test_compaction_recovers_legacy_plain_named_root_markers(
    spark, sf_small, tmp_path
):
    """A lake that crashed MID-SWAP under the pre-r10 plain-sibling
    marker naming (``path.__compact_old``, no dot prefix) and was
    then upgraded: the only copy of the data sits in the legacy
    marker, so recovery must restore it, then compact normally."""
    from omop_dump_to_parquet_spark.sinks import compact_parquet_dir
    from omop_dump_to_parquet_spark.sources.parquet import table

    li = table(spark, sf_small, "lineitem")
    path = str(tmp_path / "legacy_lake")
    # crash state: data only under the LEGACY old-name marker, plus a
    # stale legacy tmp with junk — path itself does not exist
    li.repartition(20).write.parquet(f"{path}.__compact_old")
    os.makedirs(f"{path}.__compact_tmp")
    with open(f"{path}.__compact_tmp/junk.parquet", "w") as f:
        f.write("not parquet")

    n = compact_parquet_dir(spark, path, target_file_bytes=512 * 1024)
    assert len(glob.glob(f"{path}/*.parquet")) == n < 20
    assert spark.read.parquet(path).count() == li.count()
    assert not os.path.exists(f"{path}.__compact_old")
    assert not os.path.exists(f"{path}.__compact_tmp")


def test_compaction_cleans_stale_legacy_markers_beside_live_path(
    spark, sf_small, tmp_path
):
    """If the path itself survived the legacy-era crash, the leftover
    plain-named markers are stale state: cleaned, never restored over
    the live data."""
    from omop_dump_to_parquet_spark.sinks import compact_parquet_dir
    from omop_dump_to_parquet_spark.sources.parquet import table

    li = table(spark, sf_small, "lineitem")
    path = str(tmp_path / "live_lake")
    li.repartition(20).write.parquet(path)
    # stale legacy markers with DIFFERENT (wrong) contents
    li.limit(5).write.parquet(f"{path}.__compact_old")
    os.makedirs(f"{path}.__compact_tmp")

    n = compact_parquet_dir(spark, path, target_file_bytes=512 * 1024)
    assert len(glob.glob(f"{path}/*.parquet")) == n < 20
    assert spark.read.parquet(path).count() == li.count()  # live data won
    assert not os.path.exists(f"{path}.__compact_old")
    assert not os.path.exists(f"{path}.__compact_tmp")


def test_zorder_nan_in_data_without_bounds_degrades_gracefully(spark):
    """No caller bounds + a NaN in the column: Spark's max() returns
    NaN (NaN orders above everything), which pre-guard poisoned the
    derived bounds and collapsed the dimension. NaN is now excluded
    from the stats aggregation, so non-NaN values keep their REAL
    quantization bounds and the NaN row follows the per-row NULL
    policy (bottom bucket) — never a throw, never an out-of-space
    key."""
    from omop_dump_to_parquet_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, float("nan"), 20.0), (2, 3.0, 30.0)],
        "id bigint, x double, y double",
    )
    bits = 8
    out = df.select(
        "id", zorder_key(df, ["x", "y"], bits=bits).alias("zk")
    ).collect()
    hi = (1 << (bits * 2)) - 1
    assert all(0 <= r["zk"] <= hi for r in out)

    def deinterleave(key, d):
        return sum(((key >> (2 * i + d)) & 1) << i for i in range(bits))

    by_id = {r["id"]: r["zk"] for r in out}
    max_q = (1 << bits) - 1
    # x (dim 0): bounds come from the non-NaN values {1.0, 3.0}, so
    # 1.0 -> bottom, 3.0 -> top, NaN -> NULL policy (bottom)
    assert deinterleave(by_id[0], 0) == 0
    assert deinterleave(by_id[2], 0) == max_q
    assert deinterleave(by_id[1], 0) == 0
    # y (dim 1) clusters normally
    ys = [deinterleave(by_id[i], 1) for i in (0, 1, 2)]
    assert ys[0] < ys[1] < ys[2]
