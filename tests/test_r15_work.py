"""r15 new-id proofs: p10 (production-width sparse decontamination)
and t24 (model-based quality-classifier inference).

p10's claim is REGIME, not just values: the r14 Heaps rehearsal showed
width-3 decontamination on Zipf text flags ~99.8% of docs (degenerate),
so these tests pin that p10 runs the same kernel where the broadcast-
hit path is SELECTIVE — sparse output, planted collisions found, plan
shape unchanged. t24's claim is the production plumbing: broadcast
weight vector, zero shuffles, exact-integer logits the oracle
reproduces, and a decision label that is exactly sign(logit).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omop_dump_to_parquet_spark import load_catalog
from omop_dump_to_parquet_spark.operators.pipeline import (
    P09_EVAL_MOD,
    P10_INJ_MOD,
    P10_INJ_RESIDUE,
    P10_NGRAM,
    p10_injected_corpus,
)


@pytest.fixture(scope="module")
def catalog():
    return load_catalog()


# --------------------------------------------------------------------------
# p10 — sparse-regime decontamination
# --------------------------------------------------------------------------


def test_p10_plan_is_broadcast_single_corpus_shuffle(spark, sf_small, catalog):
    """p09's 100 TB plan arguments must carry over at width 8: eval
    grams and the donor-span injection both broadcast, no SortMergeJoin
    anywhere (the corpus shuffles exactly once, at groupBy(doc_id))."""
    queries, _ = catalog
    plan = (
        queries["p10_decontamination_sparse"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_p10_regime_is_sparse(spark, sf_small, catalog):
    """The certified regime: nonzero but <10% of train docs flagged —
    the selective production shape, not the width-3 near-total one."""
    queries, _ = catalog
    from omop_dump_to_parquet_spark.sources.parquet import table

    flagged = queries["p10_decontamination_sparse"](spark, sf_small).count()
    n_train = (
        table(spark, sf_small, "documents")
        .filter(F.col("doc_id") % P09_EVAL_MOD != 0)
        .count()
    )
    assert flagged > 0
    assert flagged / n_train < 0.10, (flagged, n_train)


def test_p10_finds_every_planted_collision(spark, sf_small, catalog):
    """Completeness: every injected train doc whose donor span is a
    full 8-gram must be flagged (the planted span IS an eval 8-gram),
    and eval docs are never flagged."""
    queries, _ = catalog
    rows = {
        r["doc_id"]: r
        for r in queries["p10_decontamination_sparse"](
            spark, sf_small
        ).collect()
    }
    corpus = p10_injected_corpus(spark, sf_small)
    injected = [
        r["doc_id"]
        for r in corpus.filter(
            (F.col("doc_id") % P10_INJ_MOD == P10_INJ_RESIDUE)
            & (F.col("doc_id") % P09_EVAL_MOD != 0)
            # donor span appended AND forms a full 8-gram
            & (F.size(F.split("text", " ")) >= P10_NGRAM)
        ).collect()
    ]
    assert injected, "fixture must plant collisions"
    for doc_id in injected:
        assert doc_id in rows, f"planted doc {doc_id} not flagged"
        r = rows[doc_id]
        assert 1 <= r["n_contaminated"] <= r["n_doc_grams"]
    for doc_id in rows:
        assert doc_id % P09_EVAL_MOD != 0, "eval docs never flagged"


def test_p10_corpus_derivation_only_touches_injected_docs(spark, sf_small):
    """The derived corpus differs from the raw fixture EXACTLY on the
    doc_id % 19 == 3 stripe (everything else byte-identical), so the
    sparse regime is attributable to the planted spans alone."""
    from omop_dump_to_parquet_spark.sources.parquet import table

    raw = table(spark, sf_small, "documents").select("doc_id", "text")
    derived = p10_injected_corpus(spark, sf_small)
    diff = (
        raw.alias("a")
        .join(derived.alias("b"), "doc_id")
        .filter(F.col("a.text") != F.col("b.text"))
        .select("doc_id", F.col("a.text").alias("orig"), F.col("b.text").alias("inj"))
        .collect()
    )
    assert diff, "injection must change some docs"
    for r in diff:
        assert r["doc_id"] % P10_INJ_MOD == P10_INJ_RESIDUE
        assert r["inj"].startswith(r["orig"] + " ")


# --------------------------------------------------------------------------
# t24 — classifier inference plumbing
# --------------------------------------------------------------------------


def test_t24_plan_has_no_shuffle(spark, sf_small, catalog):
    """Inference is scan → broadcast weights → map-side project: no
    Exchange other than the BroadcastExchange of the one-row weight
    vector — the property that makes it free at 100 TB."""
    queries, _ = catalog
    plan = (
        queries["t24_quality_classifier"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_t24_logit_matches_driver_side_recompute(spark, sf_small, catalog):
    """Row-level ground truth: recompute a sample of logits in plain
    Python from the same weight formula and md5 hash; exact match."""
    import hashlib

    from omop_dump_to_parquet_spark.operators.text import (
        T24_DIM,
        t24_weights,
    )
    from omop_dump_to_parquet_spark.sources.parquet import table

    queries, _ = catalog
    got = {
        r["doc_id"]: (r["n_features"], r["logit"], r["label"])
        for r in queries["t24_quality_classifier"](spark, sf_small).collect()
    }
    w = t24_weights()
    sample = (
        table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 37 == 0)
        .collect()
    )
    assert sample
    for r in sample:
        toks = r["text"].split(" ")
        feats = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        logit = sum(
            w[int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % T24_DIM]
            for f in feats
        )
        assert got[r["doc_id"]] == (len(feats), logit, logit > 0), r["doc_id"]


def test_st12_stream_equals_t24_batch(spark, sf_small, catalog):
    """The batch≡stream certificate, set-exact: st12 (classifier under
    readStream) and t24 (batch) must produce identical row sets — the
    op is stateless, so replaying the corpus as one micro-batch IS the
    batch computation."""
    queries, _ = catalog
    batch = {
        tuple(r)
        for r in queries["t24_quality_classifier"](spark, sf_small).collect()
    }
    stream = {
        tuple(r)
        for r in queries["st12_stream_quality_classifier"](
            spark, sf_small
        ).collect()
    }
    assert batch == stream
    assert batch


def test_t24_label_split_is_mixed(spark, sf_small, catalog):
    """The decision threshold must actually separate the fixture (both
    classes present) — a degenerate all-one-label output would make the
    classifier stage vacuous as a filter."""
    queries, _ = catalog
    labels = (
        queries["t24_quality_classifier"](spark, sf_small)
        .groupBy("label")
        .count()
        .collect()
    )
    assert len(labels) == 2, labels
