#!/usr/bin/env python
"""Same-session paired A/B (r17, verdict #2): the prefix-filter census
restructure in ``_ranked_tokens`` — explicit (block, token) repartition
shared by the df groupBy and its join, nw via the rank window — vs the
r16 shape (independent dfreq groupBy + join, separate sizes aggregate +
doc_id join). Driven through the FULL d03 and d07 pipelines (candidates
+ exact verify), old arm replicated in-script.

    python scripts/r17_ab_census.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omop_dump_to_parquet_spark.operators import dedup as D
    from omop_dump_to_parquet_spark.session import get_spark
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_census")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = table(spark, sf_dir, "documents")

    def ranked_old(docs_, *block_cols, tokens=None):
        d = D._guard_block_population(
            docs_, block_cols, D.DEFAULT_MAX_BLOCK_DOCS
        )
        tok = D._distinct_tokens(d, *block_cols, tokens=tokens)
        sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nw"))
        dfreq = tok.groupBy(*block_cols, "w").agg(
            F.count(F.lit(1)).alias("df")
        )
        return (
            tok.join(dfreq, [*block_cols, "w"])
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("doc_id").orderBy(
                        F.col("df").asc(), F.col("w").asc()
                    )
                ),
            )
            .join(sizes, "doc_id")
        )

    def candidates_old(docs_, num, den, *block_cols, tokens=None):
        ranked = ranked_old(docs_, *block_cols, tokens=tokens)
        ceil_t_nw = F.floor(
            (F.lit(num) * F.col("nw") + F.lit(den - 1)) / F.lit(den)
        )
        index = ranked.filter(
            F.col("rn") <= F.col("nw") - ceil_t_nw + 1
        ).alias("b")
        probe = ranked.alias("a")
        overlap_ub = F.lit(1) + F.least(
            F.col("a.nw") - F.col("a.rn"), F.col("b.nw") - F.col("b.rn")
        )
        cond = (
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.nw") * den >= F.col("b.nw") * num)
            & (F.col("b.nw") * den >= F.col("a.nw") * num)
            & (
                overlap_ub * (num + den)
                >= F.lit(num) * (F.col("a.nw") + F.col("b.nw"))
            )
        )
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return probe.join(index, cond).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        ).distinct()

    ratio3 = Fraction(str(D.JACCARD_THRESHOLD))
    ratio7 = Fraction(str(D.SHINGLE_THRESHOLD))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def d03_old():
        cands = candidates_old(
            docs, ratio3.numerator, ratio3.denominator, "lang", "source"
        )
        noop(D.verify_jaccard_pairs(docs, cands, D.JACCARD_THRESHOLD))

    def d03_new():
        noop(D.d03_dedup_ngram_jaccard(spark, sf_dir))

    def d07_old():
        docs_sh = D.widen_scan(
            docs.select("doc_id", "lang", "source", "text")
        ).select(
            "doc_id", "lang", "source",
            D.word_shingles(F.col("text"), D.SHINGLE_N).alias("toks"),
        ).localCheckpoint(eager=False)
        sh = F.col("toks")
        cands = candidates_old(
            docs_sh, ratio7.numerator, ratio7.denominator,
            "lang", "source", tokens=sh,
        )
        noop(D.verify_jaccard_pairs(
            docs_sh, cands, D.SHINGLE_THRESHOLD, tokens=sh
        ))

    def d07_new():
        noop(D.d07_dedup_shingle_jaccard(spark, sf_dir))

    # equality gate once before timing (candidate sets may differ in
    # neither direction — same ranked values ⇒ same candidates)
    a = {(r["doc_a"], r["doc_b"]) for r in candidates_old(
        docs, ratio3.numerator, ratio3.denominator, "lang", "source"
    ).collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in D.prefix_filter_candidates(
        docs, ratio3.numerator, ratio3.denominator, "lang", "source"
    ).collect()}
    print(f"candidate-set equality: {a == b} ({len(a)} pairs)", flush=True)

    arms = {
        "d03_old": d03_old,
        "d03_new": d03_new,
        "d07_old": d07_old,
        "d07_new": d07_new,
    }
    results = {k: [] for k in arms}
    for _ in range(reps):
        for k, fn in arms.items():
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            results[k].append(round(time.perf_counter() - t0, 3))
    for k in arms:
        print(
            f"{k:8s} median {statistics.median(results[k]):6.3f}s "
            f"{results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
