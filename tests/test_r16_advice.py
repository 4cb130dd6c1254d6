"""Regression tests for the r15 advisor notes applied in r16:

* the d15 kernel zero-shuffle certificate asserted the dead token
  "ShuffleExchange" (executed plans render shuffles as "Exchange
  <partitioning>"); the real certificate — every Exchange occurrence
  is a BroadcastExchange — is now asserted in test_r15b_work.py and
  its strength is proven here by showing a plan WITH a shuffle fails
  the new predicate while passing the old one (advice: low);
* `widen_scan` called `df.rdd.getNumPartitions()` unconditionally,
  which raises AnalysisException on a streaming DataFrame — it now
  early-returns the stream unchanged (advice: low);
* the hash(*) forcing recipe existed as three drifting copies
  (bench.run_once, scale_rehearsal, constant_audit), each checking
  only TOP-LEVEL MapType — `F.hash` also rejects maps nested inside
  struct/array, so a catalog op emitting one would have crashed the
  audit scripts rather than been timed. One importable
  `force.forced_count` now handles transitive maps (advice: low);
* p11's exact-BIGINT weight differential rides `round(ln(x)*1e9)` in
  two engines whose `ln` is not guaranteed correctly-rounded — the
  accepted last-ULP risk is documented at the quantization site
  (pipeline.py P11 weights builder; no behavior change, note-only).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_new_shuffle_predicate_rejects_a_real_shuffle(spark):
    """The r15 draft's `"ShuffleExchange" not in plan` passes on ANY
    plan (dead token); the r16 predicate — strip BroadcastExchange,
    then no Exchange remains — must fail on a plan that genuinely
    shuffles, of every partitioning kind the advisor listed."""
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    shuffled = df.groupBy("k").agg(F.sum("v").alias("s"))
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan  # the dead token: vacuously true
    assert "Exchange" in plan.replace("BroadcastExchange", "")  # real check fires

    rr = df.repartition(4)  # roundrobinpartitioning — old token also missed it
    plan_rr = rr._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan_rr
    assert "Exchange" in plan_rr.replace("BroadcastExchange", "")


def test_widen_scan_passes_streams_through(spark, tmp_path):
    """widen_scan(stream) must return the stream unchanged instead of
    raising on `.rdd` (pre-fix: AnalysisException 'Queries with
    streaming sources must be executed with writeStream.start()')."""
    from omop_dump_to_parquet_spark.operators.dedup import widen_scan

    src = str(tmp_path / "stream_src")
    spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("x y z").alias("text")
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = widen_scan(stream)
    assert out.isStreaming
    assert out is stream  # unchanged, no extra plan nodes


def test_widen_scan_still_widens_narrow_batch_scans(spark, sf_small):
    """The batch behavior is untouched: a single-file fixture scan
    still round-robins up to the session shuffle width."""
    from omop_dump_to_parquet_spark.operators.dedup import widen_scan
    from omop_dump_to_parquet_spark.sources.parquet import table

    docs = table(spark, sf_small, "documents")
    n_before = docs.rdd.getNumPartitions()
    widened = widen_scan(docs)
    n_session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if n_before >= n_session:
        assert widened is docs
    else:
        assert widened.rdd.getNumPartitions() == n_session


def test_forced_count_handles_nested_maps(spark):
    """F.hash raises on maps ANYWHERE in the type tree; forced_count
    must route transitively-map-bearing columns through to_json. The
    r15 copies would have raised AnalysisException on every one of
    these shapes."""
    from omop_dump_to_parquet_spark.force import forced_count

    df = spark.range(3).select(
        "id",
        F.create_map(F.lit("k"), F.col("id")).alias("top_map"),
        F.struct(F.create_map(F.lit("k"), F.col("id")).alias("m")).alias(
            "struct_map"
        ),
        F.array(F.create_map(F.lit("k"), F.col("id"))).alias("arr_map"),
        F.create_map(
            F.lit("outer"), F.create_map(F.lit("inner"), F.col("id"))
        ).alias("map_map"),
    )
    assert forced_count(df) == 3


def test_contains_map_type_walk():
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from omop_dump_to_parquet_spark.force import contains_map

    assert not contains_map(LongType())
    assert not contains_map(ArrayType(StringType()))
    assert contains_map(MapType(StringType(), LongType()))
    assert contains_map(ArrayType(MapType(StringType(), LongType())))
    assert contains_map(
        StructType(
            [
                StructField("a", LongType()),
                StructField(
                    "b", ArrayType(MapType(StringType(), LongType()))
                ),
            ]
        )
    )
    assert not contains_map(
        StructType([StructField("a", ArrayType(StringType()))])
    )


def test_forcing_copies_all_delegate_to_shared_recipe(spark):
    """The three instruments must produce identical forced counts via
    the ONE shared function — no drifting copies (r15 advisor asked
    for the factoring explicitly)."""
    import importlib.util
    import os

    def _load(name):
        path = os.path.join(
            os.path.dirname(__file__), "..", "scripts", f"{name}.py"
        )
        sp = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(sp)
        sp.loader.exec_module(mod)
        return mod

    ca = _load("constant_audit")
    sr = _load("scale_rehearsal")
    from omop_dump_to_parquet_spark.force import forced_count

    df = spark.range(5).select(
        "id", F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    assert sr._force_rows(df) == ca._force_rows(df) == forced_count(df) == 5
