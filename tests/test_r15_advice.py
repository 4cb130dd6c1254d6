"""Regression tests for the r14 advisor notes applied in r15:

* `mixture_threshold_draw`'s ('g', 0) whole-source-keep branch is
  unreachable through `mixture_quotas` (q = min(n_s, tgt) <= n_s means
  the prefix loop always breaks), so it is exercised DIRECTLY with a
  raw uncapped quota > n_s here, and the p08 banner now says full-quota
  sources are kept whole via the boundary path (advice: low);
* the t22/t23 '|' word-boundary sentinel invariant is asserted on the
  DRIVER fixtures themselves (and in scripts/gen_random_fixture.py for
  randomized fixtures), so both engines always see the same domain and
  the row-side raise_error stays defense-in-depth (advice: low).
"""

from __future__ import annotations

import collections

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_MEDIUM, SF_SMALL


def test_threshold_draw_raw_uncapped_quota_keeps_whole_source(spark):
    """A RAW quota strictly greater than a source's row count must take
    the ('g', 0) keep-all branch (no boundary prefix exists: the
    histogram loop exhausts without cum + n >= q) and keep every row —
    the guard for callers outside mixture_quotas' q <= n_s cap."""
    from omop_dump_to_parquet_spark.operators.pipeline import (
        mixture_threshold_draw,
    )

    docs = spark.createDataFrame(
        [(i, "minor" if i % 5 == 0 else "major") for i in range(200)],
        "doc_id long, source string",
    )
    counts = collections.Counter(r["source"] for r in docs.collect())
    # minor gets an UNCAPPED quota 3x its size; major a partial draw
    quotas = {"minor": counts["minor"] * 3, "major": counts["major"] // 2}
    kept = collections.Counter(
        r["source"] for r in mixture_threshold_draw(docs, quotas).collect()
    )
    assert kept["minor"] == counts["minor"], (kept, counts)
    assert kept["major"] == quotas["major"], (kept, quotas)


def test_threshold_draw_keep_all_bound_is_the_g_sentinel(spark):
    """Pin the mechanism, not just the outcome: with an uncapped quota
    every row of that source must arrive via the sort-free 'sure' leg
    (pfx < 'g'), i.e. zero of its rows pass through the boundary
    window. Re-derive the split the way the operator does."""
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.operators.pipeline import (
        P06_SEED,
        mixture_threshold_draw,
    )

    docs = spark.createDataFrame(
        [(i, "only") for i in range(50)], "doc_id long, source string"
    )
    out = mixture_threshold_draw(docs, {"only": 1000})
    assert out.count() == 50
    # no 2-hex md5 prefix sorts >= 'g', so pfx < 'g' (the no-window
    # leg) covers every row — the boundary window's input is EMPTY
    n_ge_g = docs.select(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(f":{P06_SEED}"))
            ),
            1,
            2,
        ).alias("pfx")
    ).filter(F.col("pfx") >= "g").count()
    assert n_ge_g == 0


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
def test_driver_fixture_texts_contain_no_pipe_sentinel(sf_dir):
    """The t22/t23 contracts assume documents.text never contains '|'
    (the Spark side raise_errors; the DuckDB oracle would silently
    treat it as a word boundary). Assert the invariant on the driver
    fixtures so the raise_error stays defense-in-depth, never a live
    engine-vs-oracle asymmetry. Randomized fixtures get the same
    assert inside scripts/gen_random_fixture.py."""
    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    assert texts
    assert not any("|" in t for t in texts)
