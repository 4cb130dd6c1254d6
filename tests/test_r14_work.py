"""Round-14 worklist tests (r13 verdict #4 and #6):

* the BPE property net at merge depth ≈8 — randomized corpora
  (newline-bearing, repeated-char, multi-space) checked THREE ways:
  learned merges vs the pure-Python Sennrich reference, and both
  learn and encode vs freshly-unrolled 8-layer DuckDB oracles;
* p08 / mixture_threshold_draw skew posture: the dominant source
  really is ≥90% of rows, the boundary bucket that reaches the only
  window sort really is sliver-sized, and both quota branches
  (boundary draw + whole-source keep) are exercised.
"""

from __future__ import annotations

import collections

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from omop_dump_to_parquet_spark.operators import text as T


# --------------------------------------------------------------------------
# pure-Python Sennrich reference with explicit exhaustion signalling
# (same algorithm as test_r13_review._py_bpe, returning the iteration
# at which the pair table went empty instead of crashing on min([]))
# --------------------------------------------------------------------------


def _py_bpe(words: dict[str, int], iters: int):
    syms = {w: list(w) for w in words}
    merges = []
    for it in range(1, iters + 1):
        pc = collections.Counter()
        for w, c in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            return merges, it  # exhausted AT iteration `it`
        (lft, rgt), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, lft, rgt, lft + rgt, cnt))
        for w, s in syms.items():
            out, k = [], 0
            while k < len(s):
                if k + 1 < len(s) and s[k] == lft and s[k + 1] == rgt:
                    out.append(lft + rgt)
                    k += 2
                else:
                    out.append(s[k])
                    k += 1
            syms[w] = out
    return merges, None


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check_corpus(spark, texts: list[str], iters: int) -> None:
    """Triple certification of learn+encode at `iters` merge depth."""
    words = collections.Counter(
        w for t in texts for w in t.split(" ")
    )
    want_merges, exhausted_at = _py_bpe(dict(words), iters)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    if exhausted_at is not None:
        with pytest.raises(ValueError, match="exhausted all adjacent"):
            T.learn_bpe_merges(docs, iters=iters)
        return
    got_merges = T.learn_bpe_merges(docs, iters=iters)
    assert got_merges == want_merges, (texts, got_merges, want_merges)

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        # learn vs a freshly-unrolled `iters`-layer oracle
        got22 = _normalize(
            pd.DataFrame(
                got_merges,
                columns=[
                    "iteration", "left_sym", "right_sym",
                    "merged_sym", "pair_count",
                ],
            )
        )
        want22 = _normalize(con.sql(T._t22_oracle(iters)).df())
        pd.testing.assert_frame_equal(got22, want22, check_dtype=False)
        # encode vs the matching-depth oracle
        got23 = _normalize(T.bpe_encode(docs, got_merges).toPandas())
        want23 = _normalize(con.sql(T._t23_oracle(iters)).df())
        pd.testing.assert_frame_equal(got23, want23, check_dtype=False)
    finally:
        con.close()


def test_bpe_depth8_on_adversarial_fixed_corpora(spark):
    """The shapes the r13 fixture never exercised, at depth 8: merged
    symbols that themselves contain earlier merges (repeated chars),
    newline symbols, and empty tokens from space runs."""
    for texts in [
        # repeated-char words: (a,a)->aa then (aa,a)/(aa,aa) chains —
        # the replace()-lockstep's non-overlapping scan must match the
        # reference's left-to-right per-word walk at every depth
        ["aaaa aaaa aaa aa baab baab", "aaab aaab aaab abba"],
        # newline-bearing words under DOTALL at depth
        ["ab\ncd ab\ncd ab\ncd xy\nxy", "ab\ncd xy\nxy zw zw zw"],
        # empty tokens everywhere: interior runs + leading/trailing
        ["low  low   lower lower ", " newest  newest newest low"],
        # astral-plane (surrogate-pair) characters: the encode's
        # char split must walk codepoints like the learner's '(?s)(.)'
        # and the oracle's string_split — a UTF-16-unit walk halves 𝕏
        ["x\U0001d54fy x\U0001d54fy x\U0001d54fy zz\U0001d54f zz\U0001d54f",
         "abcd abcd abcd x\U0001d54fy efgh efgh"],
    ]:
        _check_corpus(spark, texts, iters=8)


def test_bpe_depth8_randomized_property(spark):
    """Hypothesis over random corpora from a small alphabet (incl.
    newline and space) — merge depth 8, triple-certified."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.text(alphabet="ab c\n", min_size=0, max_size=40),
            min_size=1,
            max_size=3,
        )
    )
    def inner(texts: list[str]) -> None:
        _check_corpus(spark, texts, iters=8)

    inner()


# --------------------------------------------------------------------------
# p08 — skew posture proofs
# --------------------------------------------------------------------------


def test_p08_fixture_is_skew_dominant(spark, sf_small):
    from omop_dump_to_parquet_spark.operators.pipeline import p08_skewed_docs

    counts = {
        r["source"]: r["n"]
        for r in p08_skewed_docs(spark, sf_small)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert counts["web"] / total >= 0.90, counts


def test_p08_boundary_bucket_is_sliver_sized(spark, sf_small):
    """The ONLY sort in the threshold draw is the row_number window
    over the boundary bucket. Re-derive that bucket exactly as pass 1
    does and assert it is a ~1/256 sliver of the dominant source, not
    the source itself — the property that kills the single-task-chain
    serialization at 100 TB."""
    from omop_dump_to_parquet_spark.operators.pipeline import (
        P06_SEED,
        mixture_quotas,
        p08_skewed_docs,
    )

    docs = p08_skewed_docs(spark, sf_small)
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = mixture_quotas(counts)
    hist = (
        docs.select(
            "source",
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(f":{P06_SEED}")
                    )
                ),
                1,
                2,
            ).alias("pfx"),
        )
        .groupBy("source", "pfx")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_source: dict[str, list[tuple[str, int]]] = {}
    for r in hist:
        by_source.setdefault(r["source"], []).append((r["pfx"], r["n"]))
    dom = "web"
    cum, boundary_n = 0, None
    for pfx, n in sorted(by_source[dom]):
        if cum + n >= quotas[dom]:
            boundary_n = n
            break
        cum += n
    assert boundary_n is not None, "dominant source must hit the boundary path"
    # sliver: the windowed rows are ONE 2-hex bucket of the dominant
    # source — generous 16× headroom over the 1/256 expectation still
    # proves it's a sliver, not the source
    assert boundary_n <= max(1, counts[dom] * 16 // 256), (
        boundary_n,
        counts[dom],
    )


def test_p08_exercises_whole_source_keep_branch(spark, sf_small):
    """At least one minority source's quota equals its size (the
    `quota >= n_s → keep all, no window at all` branch): the draw must
    keep every row of such sources."""
    from omop_dump_to_parquet_spark.operators.pipeline import (
        mixture_quotas,
        mixture_threshold_draw,
        p08_skewed_docs,
    )

    docs = p08_skewed_docs(spark, sf_small)
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = mixture_quotas(counts)
    full = [s for s in counts if s != "web" and quotas[s] == counts[s]]
    assert full, (
        "skew fixture should give at least one minority source a "
        f"whole-source quota; got {quotas} over {counts}"
    )
    kept = collections.Counter(
        r["source"]
        for r in mixture_threshold_draw(docs, quotas).collect()
    )
    for s in full:
        assert kept[s] == counts[s], (s, kept[s], counts[s])


# --------------------------------------------------------------------------
# p09 — decontamination plan and invariants
# --------------------------------------------------------------------------


def test_p09_plan_is_broadcast_single_corpus_shuffle(spark, sf_small):
    """The eval gram set must broadcast (no shuffle of the corpus for
    the join) and the corpus side must shuffle exactly once (the
    groupBy(doc_id)); a SortMergeJoin anywhere means the 100 TB
    asymmetry argument broke."""
    from omop_dump_to_parquet_spark import load_catalog

    queries, _ = load_catalog()
    plan = (
        queries["p09_decontamination"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_p09_invariants(spark, sf_small):
    from omop_dump_to_parquet_spark.operators.pipeline import P09_EVAL_MOD
    from omop_dump_to_parquet_spark import load_catalog

    queries, _ = load_catalog()
    rows = queries["p09_decontamination"](spark, sf_small).collect()
    assert rows, "fixture should surface contaminated docs"
    for r in rows:
        assert r["doc_id"] % P09_EVAL_MOD != 0, "eval docs never flagged"
        assert 1 <= r["n_contaminated"] <= r["n_doc_grams"]


# --------------------------------------------------------------------------
# st11 — streaming decontamination invariants
# --------------------------------------------------------------------------


def test_st11_matches_p09_batch_output(spark, sf_small):
    """The stateless per-row re-expression under readStream must equal
    the batch groupBy plan row-for-row — batch ≡ stream on the same
    fixture (both are also oracle-certified independently)."""
    from omop_dump_to_parquet_spark import load_catalog

    queries, _ = load_catalog()
    batch = {
        (r["doc_id"], r["n_doc_grams"], r["n_contaminated"])
        for r in queries["p09_decontamination"](spark, sf_small).collect()
    }
    stream = {
        (r["doc_id"], r["n_doc_grams"], r["n_contaminated"])
        for r in queries["st11_stream_decontamination"](
            spark, sf_small
        ).collect()
    }
    assert batch == stream and batch
