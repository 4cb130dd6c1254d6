"""Focused tests for the r16 OPTIMIZATION-round changes — every one
pins an internals change whose OUTPUT must be identical to the
pre-r16 form (the round's contract: plans may change, results may
not).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from omop_dump_to_parquet_spark.operators import dedup as D
from omop_dump_to_parquet_spark.sources.parquet import table


def _verified(spark, docs, candidates):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in D.verify_jaccard_pairs(
            docs, candidates, D.MINHASH_THRESHOLD
        ).collect()
    }


def test_d04_collapsed_pipeline_matches_legacy_agg_path(spark, sf_small):
    """d04's r16 pipeline (map-side NumPy kernel → exact token-set
    group collapse → rep-level LSH + verify → member expansion) must
    yield the SAME output as the pre-r16 member-level explode+agg
    xxhash64 path. Candidate sets differ (different hash family,
    rep-level vs member-level) but both outputs are exact-verified,
    so both equal the true ≥-threshold pair set wherever LSH recall
    is 1 — asserted end-to-end on the fixture, jaccard values
    included."""
    from fractions import Fraction

    docs = table(spark, sf_small, "documents")
    ratio = Fraction(str(D.MINHASH_THRESHOLD))
    sr = (ratio.numerator, ratio.denominator)

    new = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in D.d04_dedup_minhash_lsh(spark, sf_small).collect()
    }

    nw_df = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("nw"),
    )
    legacy_sigs = D.minhash_signatures(docs).join(nw_df, "doc_id")
    legacy = _verified(
        spark, docs, D.lsh_candidate_pairs(legacy_sigs, size_ratio=sr)
    )
    assert new == legacy and len(new) > 0


def test_d04_group_collapse_is_exact(spark, sf_small):
    """Two docs share a (nw, g1, g2) group key iff their distinct
    token SETS are identical — the collapse must never merge distinct
    sets (false jaccard-1.0 pairs) nor split identical ones (missed
    within-group pairs)."""
    docs = table(spark, sf_small, "documents")
    rows = D.minhash_prepared(docs).select(
        "doc_id", "nw", "g1", "g2"
    ).collect()
    toks = {
        r["doc_id"]: frozenset(r["text"].split(" "))
        for r in docs.select("doc_id", "text").collect()
    }
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["nw"], r["g1"], r["g2"]), []).append(
            r["doc_id"]
        )
    for key, ids in by_key.items():
        sets = {toks[i] for i in ids}
        assert len(sets) == 1, f"group {key} merged distinct sets"
    # identical sets must land in the same group
    by_set: dict = {}
    for i, s in toks.items():
        by_set.setdefault(s, set()).add(i)
    keys_of = {
        r["doc_id"]: (r["nw"], r["g1"], r["g2"]) for r in rows
    }
    for s, ids in by_set.items():
        assert len({keys_of[i] for i in ids}) == 1


def test_minhash_prepared_nw_matches_expression_form(spark, sf_small):
    """The kernel's nw (|distinct tokens|) must equal the Catalyst
    expression the pre-r16 path used — it feeds the exact integer
    set-size pruning condition."""
    docs = table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: r["nw"] for r in D.minhash_prepared(docs).collect()
    }
    want = {
        r["doc_id"]: r["nw"]
        for r in docs.select(
            "doc_id",
            F.size(F.array_distinct(F.split(F.col("text"), " "))).alias(
                "nw"
            ),
        ).collect()
    }
    assert got == want


def test_d04_plan_uses_kernel_not_agg_signatures(spark, sf_small):
    """Plan shape: the d04 signature subtree is the Arrow kernel
    (MapInPandas), and the 126-column min-aggregate groupBy is gone —
    the only aggregates left belong to the hot-bucket cap machinery
    (count per (band, bkey))."""
    docs = table(spark, sf_small, "documents")
    # the signature subtree itself (pre-checkpoint): kernel, no agg
    sub = D.minhash_prepared(
        docs
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in sub
    assert "HashAggregate" not in sub and "xxhash64" not in sub
    # the full query's plan is checkpoint-truncated (Scan ExistingRDD
    # leaves), so assert the legacy 126-min-agg signature shape is
    # gone from it rather than that the kernel node is visible
    plan = D.d04_dedup_minhash_lsh(
        spark, sf_small
    )._jdf.queryExecution().executedPlan().toString()
    assert "min(xxhash64" not in plan


def test_lsh_candidate_pairs_precomputed_keys_branch(spark, sf_small):
    """The ``keys``-column fast path in lsh_candidate_pairs must be
    plan-sugar only: feeding the SAME band keys as a precomputed
    column yields the identical candidate set as the h0..h{k-1}
    signature-column form."""
    docs = table(spark, sf_small, "documents").limit(60)
    sigs = D.minhash_signatures(docs)
    via_cols = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_candidate_pairs(sigs).collect()
    }
    prekeyed = sigs.select("doc_id", D.band_keys().alias("keys"))
    via_keys = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_candidate_pairs(prekeyed, prekeyed=True).collect()
    }
    assert via_cols == via_keys and len(via_cols) > 0
    # the r17 explicit flag fails loud both ways: prekeyed=True without
    # a keys column, and a stray 'keys' column no longer silently
    # switches the path (the band_keys recombination requires h0..)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="prekeyed=True"):
        D.lsh_candidate_pairs(sigs, prekeyed=True)
    with _pytest.raises(Exception):
        D.lsh_candidate_pairs(prekeyed).collect()  # no h0.. columns
