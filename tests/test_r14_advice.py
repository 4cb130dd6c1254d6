"""Regression tests for the r13 advisor notes applied in r14:

* t23's boundary encoding is now built from the shared token array,
  so consecutive-space (empty-token) input renders identically to the
  oracle's string_split path (advice: medium);
* the '|' word-boundary sentinel is ENFORCED — fail loud both
  driver-side (a learned merge containing '|') and row-side (a
  document containing '|') instead of silently merging across word
  boundaries identically in both engines (advice: low);
* t22's symbol string uses the DOUBLE leading space, byte-identical
  to the oracle's sym0 form (advice: low).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def _write_documents(spark, tmp_path, texts: list[str]) -> str:
    """Materialize a minimal documents fixture (doc_id, text) the same
    way the driver lays out sf dirs, so the registered t22/t23 queries
    and their DuckDB oracles both read it unchanged."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        # Spark writes the table as a directory of part files
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    try:
        return con.sql(sql).df()
    finally:
        con.close()


# enough distinct multi-char words that 3 BPE iterations never exhaust,
# PLUS the whitespace shapes the r13 fixture never exercised: double
# and triple interior runs, leading and trailing spaces (empty tokens
# at every position).
MESSY_CORPUS = [
    "low low low lower lower newest newest",
    "low  lower   newest newest lowest",
    " low lower newest ",
    "newest  newest lowest lowest",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_t23_matches_oracle_on_consecutive_spaces(spark, tmp_path):
    """The exact divergence the advisor found: translate(' '→'|')
    rendered each space of a run as its own pipe while the oracle
    rendered the empty token between them — encoded_md5 and
    n_bpe_symbols hash-failed on any multi-space input."""
    from omop_dump_to_parquet_spark import load_catalog

    sf_dir = _write_documents(spark, tmp_path, MESSY_CORPUS)
    queries, oracles = load_catalog()
    got = _normalize(queries["t23_bpe_encode"](spark, sf_dir).toPandas())
    want = _normalize(_oracle(sf_dir, oracles["t23_bpe_encode"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_t22_matches_oracle_on_consecutive_spaces(spark, tmp_path):
    """Empty vocabulary 'words' (from space runs) must count and
    filter identically on both sides, and the double-leading-space
    symbol form must learn the same merges as the oracle's sym0."""
    from omop_dump_to_parquet_spark import load_catalog

    sf_dir = _write_documents(spark, tmp_path, MESSY_CORPUS)
    queries, oracles = load_catalog()
    got = _normalize(queries["t22_bpe_merges"](spark, sf_dir).toPandas())
    want = _normalize(_oracle(sf_dir, oracles["t22_bpe_merges"]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_t23_driver_guard_rejects_pipe_in_learned_merge(spark, tmp_path):
    """A corpus whose dominant pair contains '|' must fail loud at the
    driver (before any encode job runs): a merge symbol containing the
    sentinel could cross word boundaries at apply time."""
    from omop_dump_to_parquet_spark import load_catalog

    sf_dir = _write_documents(
        spark, tmp_path, ["a| a| a| a| a| bcd efg hij"]
    )
    queries, _ = load_catalog()
    with pytest.raises(ValueError, match="boundary[ ]sentinel"):
        queries["t23_bpe_encode"](spark, sf_dir).collect()


def test_t23_row_guard_rejects_pipe_in_text(spark, tmp_path):
    """A document containing '|' that never reaches a learned merge
    must still fail loud at encode time (row-level raise_error in the
    same map-side pass, zero extra jobs)."""
    from omop_dump_to_parquet_spark import load_catalog

    # '|' appears once, in a unique word: every learned merge comes
    # from the repeated plain words, so the driver-side guard passes
    # and the row-level guard is the one that must fire.
    sf_dir = _write_documents(
        spark,
        tmp_path,
        ["low low low lower lower newest newest", "odd|word here"],
    )
    queries, _ = load_catalog()
    with pytest.raises(Exception, match="sentinel"):
        queries["t23_bpe_encode"](spark, sf_dir).collect()


def test_t22_symbol_rep_is_byte_identical_to_oracle_sym0(spark):
    """The learned-rep invariant itself: '  a  b  c  ' with DOUBLE
    leading space, exactly the oracle's '  ' || join || '  ' form."""
    from pyspark.sql import functions as F

    word = spark.createDataFrame([("abc",)], "word string")
    got = word.select(
        F.concat(
            F.lit("  "), F.regexp_replace("word", "(?s)(.)", "$1  ")
        ).alias("rep")
    ).first()["rep"]
    want = duckdb.sql(
        "SELECT '  ' || array_to_string(string_split('abc', ''), '  ')"
        " || '  '"
    ).fetchone()[0]
    assert got == want == "  a  b  c  "
