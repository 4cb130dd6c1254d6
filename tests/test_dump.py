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


def test_upsert_merges_by_key(spark, sf_small, tmp_path):
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.plans import upsert_parquet

    cust = spark.read.parquet(f"{sf_small}/customer.parquet")
    lake = str(tmp_path / "cust_lake")
    cust.write.parquet(lake)

    # updates: change acctbal for 5 existing keys, add 2 new keys
    changed = (
        cust.orderBy("c_custkey").limit(5)
        .withColumn("c_acctbal", F.lit(999999.0))
    )
    new = (
        cust.orderBy(F.col("c_custkey").desc()).limit(2)
        .withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
    )
    updates = changed.unionByName(new)

    n = upsert_parquet(spark, lake, updates, ["c_custkey"])
    back = spark.read.parquet(lake)
    assert n == back.count() == cust.count() + 2
    assert back.filter(F.col("c_acctbal") == 999999.0).count() == 5
    assert back.filter(F.col("c_custkey") > 1_000_000).count() == 2
    # untouched keys keep their original rows
    untouched = back.join(updates.select("c_custkey"), "c_custkey", "left_anti")
    orig = cust.join(updates.select("c_custkey"), "c_custkey", "left_anti")
    assert untouched.exceptAll(orig).count() == 0

    # schema drift is rejected, lake untouched
    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_parquet(spark, lake, updates.drop("c_acctbal"), ["c_custkey"])
    assert spark.read.parquet(lake).count() == cust.count() + 2


def test_verify_handles_uri_escapable_paths_and_zero_row_shards(
    spark, sf_small, tmp_path
):
    """Percent-encoding reconciliation: a path with a space must not
    double-count as a phantom 0-row shard, and a genuinely empty shard
    must still be reported (via the Hadoop-FS listing, which also
    covers non-file schemes)."""
    from omop_dump_to_parquet_spark.sources.parquet import table
    from omop_dump_to_parquet_spark.verify import verify_parquet

    out = str(tmp_path / "with space" / "region")
    df = table(spark, sf_small, "region")
    df.coalesce(1).write.parquet(out)
    rep = verify_parquet(spark, out, expected_count=df.count())
    assert rep.count_matches
    assert rep.n_files == 1, rep.per_file_rows
    assert all(" " in f for f in rep.per_file_rows), rep.per_file_rows

    # add an empty shard: same schema, zero rows
    df.limit(0).coalesce(1).write.mode("append").parquet(out)
    rep2 = verify_parquet(spark, out, expected_count=df.count())
    assert rep2.count_matches
    assert rep2.n_files == 2, rep2.per_file_rows
    assert 0 in rep2.per_file_rows.values()


def test_verify_fast_footer_mode_matches_full_scan(spark, sf_small, tmp_path):
    """fast=True reads ONLY parquet footers (the reference's
    metadata-level verification, dump_table.py:244-246) and must agree
    file-by-file with the row-iterating mode, including 0-row shards
    and URI-escapable paths."""
    from omop_dump_to_parquet_spark.sources.parquet import table
    from omop_dump_to_parquet_spark.verify import verify_parquet

    out = str(tmp_path / "with space" / "orders")
    df = table(spark, sf_small, "orders")
    df.repartition(3).write.parquet(out)
    df.limit(0).coalesce(1).write.mode("append").parquet(out)

    full = verify_parquet(
        spark, out, expected_count=df.count(), max_records_per_file=10**9
    )
    fast = verify_parquet(
        spark,
        out,
        expected_count=df.count(),
        max_records_per_file=10**9,
        fast=True,
    )
    assert fast.count_matches and full.count_matches
    assert fast.per_file_rows == full.per_file_rows
    assert fast.n_files == full.n_files == 4
    assert fast.sizing_ok and fast.max_file_rows == full.max_file_rows


def test_orc_roundtrip_sized_shards(spark, sf_small, tmp_path):
    """ORC source/sink: sized shards + identical data back."""
    from omop_dump_to_parquet_spark.sinks.parquet_sink import write_orc
    from omop_dump_to_parquet_spark.sources.files import read_orc
    from omop_dump_to_parquet_spark.sources.parquet import table

    df = table(spark, sf_small, "customer")
    out = str(tmp_path / "customer_orc")
    write_orc(df, out, max_records_per_file=40)
    back = read_orc(spark, out)
    assert back.count() == df.count()
    assert back.schema == df.schema
    assert back.exceptAll(df).count() == 0
    import glob

    shards = glob.glob(f"{out}/*.orc")
    assert shards and all(
        r <= 40
        for r in [
            spark.read.orc(s).count() for s in shards
        ]
    )


def test_binary_file_ingestion_to_multimodal_lake(spark, tmp_path):
    """binaryFile source → m01-shaped lake: one row per raw file,
    bytes + metadata, glob filtering source-side."""
    from omop_dump_to_parquet_spark.sources.files import read_binary_files

    land = tmp_path / "raw"
    land.mkdir()
    (land / "a.img").write_bytes(b"\x89PNG fake payload")
    (land / "b.img").write_bytes(b"\xff\xd8 other payload!!")
    (land / "ignore.txt").write_text("not media")
    df = read_binary_files(spark, str(land), path_glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert rows["a.img"]["length"] == 17
    assert bytes(rows["a.img"]["content"]).startswith(b"\x89PNG")


def test_upsert_is_idempotent_for_replayed_batch(spark, sf_small, tmp_path):
    """The st07 exactly-once argument: re-applying the same update
    batch (a foreachBatch replay after crash) must leave the lake
    byte-identical — upsert-by-key is a set merge, not an append."""
    from omop_dump_to_parquet_spark.plans import upsert_parquet
    from omop_dump_to_parquet_spark.sources.parquet import table

    lake = str(tmp_path / "lake")
    table(spark, sf_small, "region").write.parquet(lake)
    updates = spark.createDataFrame(
        [(1, "REPLAYED")], "r_regionkey int, r_name string"
    )
    n1 = upsert_parquet(spark, lake, updates, ["r_regionkey"])
    first = sorted(map(tuple, spark.read.parquet(lake).collect()))
    n2 = upsert_parquet(spark, lake, updates, ["r_regionkey"])
    second = sorted(map(tuple, spark.read.parquet(lake).collect()))
    assert n1 == n2
    assert first == second


class TestResumableDump:
    def test_resume_skips_committed_chunks_and_redumps_torn_ones(
        self, spark, sf_small, tmp_path
    ):
        """Crash mid-dump (test hook), then resume: committed chunks
        are skipped, the torn chunk is replaced, totals conserve."""
        import pytest

        from omop_dump_to_parquet_spark.plans.resume import (
            dump_table_resumable,
        )
        from omop_dump_to_parquet_spark.sources.parquet import table

        li = table(spark, sf_small, "lineitem")
        out = str(tmp_path / "lake")
        # split-not-filter semantics: the chunked union covers EVERY
        # source row, including keys outside the seed bounds
        n_total = li.count()

        with pytest.raises(RuntimeError, match="simulated crash"):
            dump_table_resumable(
                spark,
                li,
                out,
                "l_orderkey",
                1,
                6000,
                n_chunks=4,
                fail_after_chunk=2,
            )

        # simulate a torn write in the next (uncommitted) chunk
        torn = f"{out}/chunk=00002"
        import os

        os.makedirs(torn, exist_ok=True)
        with open(f"{torn}/part-garbage.parquet", "w") as fh:
            fh.write("not parquet")

        res = dump_table_resumable(
            spark, li, out, "l_orderkey", 1, 6000, n_chunks=4
        )
        assert res.chunks_skipped == 2  # first attempt's work reused
        assert res.chunks_dumped == 2
        assert res.ok
        assert res.rows_written == n_total
        # the lake reads back whole and the torn file is gone
        assert (
            spark.read.parquet(f"{out}/chunk=*").count() == n_total
        )

    def test_rerun_after_success_is_all_skips(self, spark, sf_small, tmp_path):
        from omop_dump_to_parquet_spark.plans.resume import (
            dump_table_resumable,
        )
        from omop_dump_to_parquet_spark.sources.parquet import table

        li = table(spark, sf_small, "lineitem")
        out = str(tmp_path / "lake")
        first = dump_table_resumable(
            spark, li, out, "l_orderkey", 1, 6000, n_chunks=3
        )
        again = dump_table_resumable(
            spark, li, out, "l_orderkey", 1, 6000, n_chunks=3
        )
        assert first.ok and again.ok
        assert again.chunks_skipped == 3 and again.chunks_dumped == 0
        assert again.rows_written == first.rows_written

    def test_resume_with_different_chunking_fails_fast(
        self, spark, sf_small, tmp_path
    ):
        """Markers are self-describing; resuming over them with a
        different chunk layout must raise, not silently mix layouts."""
        import pytest

        from omop_dump_to_parquet_spark.plans.resume import (
            dump_table_resumable,
        )
        from omop_dump_to_parquet_spark.sources.parquet import table

        li = table(spark, sf_small, "lineitem")
        out = str(tmp_path / "lake")
        dump_table_resumable(spark, li, out, "l_orderkey", 1, 6000, n_chunks=4)
        with pytest.raises(ValueError, match="parameter mismatch"):
            dump_table_resumable(
                spark, li, out, "l_orderkey", 1, 6000, n_chunks=2
            )
        with pytest.raises(ValueError, match="parameter mismatch"):
            dump_table_resumable(
                spark, li, out, "l_orderkey", 1000, 6000, n_chunks=4
            )

    def test_stale_bounds_lose_no_rows(self, spark, sf_small, tmp_path):
        """Edge chunks are unbounded (split-not-filter semantics), so
        bounds from a stale min/max estimate still cover every row —
        including keys outside [lower, upper]."""
        from omop_dump_to_parquet_spark.plans.resume import (
            dump_table_resumable,
        )
        from omop_dump_to_parquet_spark.sources.parquet import table

        li = table(spark, sf_small, "lineitem")
        out = str(tmp_path / "lake")
        # bounds cover only the middle of the real key range [1, 6000]
        res = dump_table_resumable(
            spark, li, out, "l_orderkey", 2000, 4000, n_chunks=3
        )
        assert res.ok
        assert res.rows_written == li.count()

    def test_empty_source_reports_zero_conserved(
        self, spark, sf_small, tmp_path
    ):
        """All-empty chunks write directories with no data files; the
        read-back supplies the source schema so the verify reports a
        trivially-conserved 0-row dump instead of erroring on schema
        inference over an empty glob."""
        from omop_dump_to_parquet_spark.plans.resume import (
            dump_table_resumable,
        )
        from omop_dump_to_parquet_spark.sources.parquet import table

        li = table(spark, sf_small, "lineitem").filter("l_orderkey < 0")
        out = str(tmp_path / "lake")
        res = dump_table_resumable(
            spark, li, out, "l_orderkey", 1, 6000, n_chunks=3
        )
        assert res.ok
        assert res.rows_written == 0
        assert res.read_back_rows == 0


def test_lake_additive_schema_evolution(spark, sf_small, tmp_path):
    """Two dump generations into one lake — v2 adds a nullable column
    — must read back as ONE table under read_lake(merge_schema=True):
    union schema, counts conserved, pre-evolution rows NULL in the
    new column; and the schema-stable default (merge_schema=False)
    still reads a single-generation lake untouched."""
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.sources.parquet import read_lake

    src = table(spark, sf_small, "documents").select(
        "doc_id", "text", "lang"
    )
    v1_dir, v2_dir = str(tmp_path / "gen=1"), str(tmp_path / "gen=2")
    r1 = dump_table(spark, src, v1_dir)
    assert r1.ok
    v2 = src.withColumn(
        "quality", (F.length("text") % 7).cast("double")
    ).withColumn("doc_id", F.col("doc_id") + 100_000)
    r2 = dump_table(spark, v2, v2_dir)
    assert r2.ok

    merged = read_lake(spark, v1_dir, v2_dir, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "text", "lang", "quality"}
    n1, n2 = src.count(), v2.count()
    assert merged.count() == n1 + n2
    # every pre-evolution row reads NULL in the evolved column; every
    # post-evolution row keeps its value
    nulls = merged.filter(F.col("quality").isNull()).count()
    assert nulls == n1
    kept = (
        merged.filter(F.col("doc_id") >= 100_000)
        .select(
            F.sum(
                (
                    F.col("quality") == (F.length("text") % 7).cast("double")
                ).cast("int")
            ).alias("ok")
        )
        .first()["ok"]
    )
    assert kept == n2

    # schema-stable default path is unchanged
    plain = read_lake(spark, v1_dir)
    assert set(plain.columns) == {"doc_id", "text", "lang"}
    assert plain.count() == n1


def test_upsert_rejects_duplicate_update_keys(spark, sf_small, tmp_path):
    """r10 review: duplicate keys WITHIN an update batch would land
    multiple rows per key in the lake (anti-join drops the old row,
    union keeps both new ones) and the conservation check counts the
    duplicates on both sides — so the merge must fail fast instead."""
    import pytest

    from omop_dump_to_parquet_spark.plans import upsert_parquet
    from omop_dump_to_parquet_spark.sources.parquet import table

    region = table(spark, sf_small, "region")
    lake = str(tmp_path / "dup_lake")
    region.write.parquet(lake)
    dup = region.limit(1).unionByName(region.limit(1))  # same key twice
    with pytest.raises(ValueError, match="duplicate key"):
        upsert_parquet(spark, lake, dup, ["r_regionkey"])
    # lake untouched by the refused merge
    assert spark.read.parquet(lake).count() == region.count()


def test_verify_ignores_hidden_staging_files(spark, sf_small, tmp_path):
    """r10 review: verification must apply Spark's hidden-file rule —
    a dot-prefixed staging dir (compaction's crash-recovery copy)
    inside a hive root is invisible to spark.read.parquet, so
    counting its footers would fail a lake that is actually correct."""
    from omop_dump_to_parquet_spark.sources.parquet import table
    from omop_dump_to_parquet_spark.verify import verify_parquet

    docs = table(spark, sf_small, "documents")
    root = str(tmp_path / "vlake")
    docs.write.partitionBy("lang").parquet(root)
    # stale hidden staging copy of one leaf, full of real parquet
    leaf = sorted(
        d for d in __import__("os").listdir(root) if d.startswith("lang=")
    )[0]
    spark.read.parquet(f"{root}/{leaf}").write.parquet(
        f"{root}/.{leaf}.__compact_old"
    )
    for fast in (False, True):
        rep = verify_parquet(
            spark, root, expected_count=docs.count(), fast=fast
        )
        assert rep.count_matches, (fast, rep.total_rows)
