"""Fixture-layout contract: the dtypes the catalog assumes, asserted
against whatever parquet the driver currently ships.

The driver regenerates /root/testdata between rounds and has changed
the physical layout of ``events.ts`` three times (nanos-as-bigint,
then ``timestamp[us]`` isAdjustedToUTC=false → TIMESTAMP_NTZ). Each
drift silently broke every query doing instant arithmetic on ``ts``.
``sources/parquet.py::table()`` is the single choke point that
canonicalizes layouts; this test makes the NEXT drift fail here, once
and loudly, instead of in N queries at correctness-gate time.
"""

from __future__ import annotations

import pytest

from conftest import SF_MEDIUM, SF_SMALL
from omop_dump_to_parquet_spark.sources.parquet import FIXTURE_TABLES, table

# Canonical post-``table()`` dtypes. A set means "any of these is
# fine" — the catalog is agnostic there (e.g. date columns are only
# compared/truncated, never fed to instant-only functions such as
# unix_micros, so NTZ vs LTZ both work and both hash-match DuckDB
# under the pinned-UTC session).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    # ts MUST be TIMESTAMP (not NTZ): w03/w04/w06/w09/w10 and the
    # streaming suite do epoch-microsecond arithmetic via ts_us().
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    # array<float>: the similarity suite's Arrow kernels np.stack the
    # column as float32; float64 would double shuffle volume.
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", FIXTURE_TABLES)
def test_fixture_contract(spark, sf_small, name):
    got = dict(table(spark, sf_small, name).dtypes)
    exp = EXPECTED[name]
    assert set(got) == set(exp), f"{name}: columns drifted: {sorted(got)}"
    for col, want in exp.items():
        allowed = want if isinstance(want, set) else {want}
        assert got[col] in allowed, (
            f"{name}.{col} is {got[col]!r}, catalog assumes {sorted(allowed)} — "
            f"if the driver changed the parquet layout, canonicalize it in "
            f"sources/parquet.py::table(), not per-query"
        )


def test_ts_us_works_end_to_end(spark, sf_small):
    """ts_us() must analyze and return sane epoch micros on the shipped
    fixture — this is the exact call that broke in rounds 1 and 3."""
    from pyspark.sql import functions as F

    from omop_dump_to_parquet_spark.sources.parquet import ts_us

    row = (
        table(spark, sf_small, "events")
        .select(ts_us("ts").alias("us"))
        .agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
        .first()
    )
    # Driver fixtures are 2020s-era synthetic data; anything outside
    # [2000, 2100) means a unit error (ns/ms vs us), not new data.
    lo_2000 = 946_684_800 * 1_000_000
    hi_2100 = 4_102_444_800 * 1_000_000
    assert lo_2000 < row.lo <= row.hi < hi_2100


def test_unrolled_oracle_fanout_bounds():
    """The m03/m08/t19 oracles unroll per-document fan-out with
    HARDCODED range() bounds (m03: 4096 frames, m08: 512 hops, t19:
    4095 tokens). A fixture document growing past a bound would make
    the oracle silently drop rows and the differential gate fail as a
    confusing row-count mismatch — pin the contract here so the bound
    violation fails at THIS assertion, by name, instead (advisor
    finding, r6)."""
    import duckdb

    from omop_dump_to_parquet_spark.operators.multimodal import (
        FRAME_BYTES,
        M08_FRAME,
        M08_HOP,
    )

    for sf in (SF_SMALL, SF_MEDIUM):
        max_chars, max_tokens = duckdb.sql(
            "SELECT max(length(text)),"
            "       max(len(string_split(text, ' ')))"
            f" FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()
        # m03: frame_idx i ranges over [0, 4096); frames exist while
        # i * FRAME_BYTES < length(text).
        assert max_chars <= 4096 * FRAME_BYTES, (
            f"{sf}: max doc {max_chars}B exceeds m03's 4096-frame "
            f"oracle unroll ({4096 * FRAME_BYTES}B) — raise the bound"
        )
        # m08: hop o ranges over [0, 512); frames exist while
        # o * M08_HOP < length(text). (M08_FRAME only pads the last.)
        assert M08_FRAME > M08_HOP  # overlap layout sanity
        assert max_chars <= 512 * M08_HOP, (
            f"{sf}: max doc {max_chars}B exceeds m08's 512-hop oracle "
            f"unroll ({512 * M08_HOP}B) — raise the bound"
        )
        # t19: bigram index i ranges over [2, 4096] ∩ [2, len(ws)].
        assert max_tokens <= 4095, (
            f"{sf}: max doc {max_tokens} tokens exceeds t19's "
            f"4095-token oracle unroll — raise the bound"
        )
