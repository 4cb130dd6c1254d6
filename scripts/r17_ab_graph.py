#!/usr/bin/env python
"""Same-session paired A/B for the r17 graph-family changes (verdict
item #1). Candidate-pair generation is materialized ONCE outside the
timed region so the A/B isolates the iterative machinery itself:

  - CC  : eager per-round checkpoint + separate fingerprint job (r16)
          vs lazy checkpoint materialized BY the fingerprint (r17).
  - G01 : per-iteration (edges JOIN pr JOIN deg) (r16) vs degrees
          pre-joined into the checkpointed edge table (r17).

Reps alternate A,B,A,B,... (gc-quiesced) so box drift hits both arms;
job counts come from setJobGroup + statusTracker.

    python scripts/r17_ab_graph.py [pairs_of_reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omop_dump_to_parquet_spark.functions.deterministic import dsum
    from omop_dump_to_parquet_spark.operators import graph as G
    from omop_dump_to_parquet_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_graph")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    pairs = G._d03_pairs(spark, sf_dir).select(
        "doc_a", "doc_b"
    ).localCheckpoint(eager=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    st = spark.sparkContext.statusTracker()

    def run(label, fn):
        spark.sparkContext._jvm.System.gc()
        group = f"ab-{label}-{time.monotonic_ns()}"
        spark.sparkContext.setJobGroup(group, label)
        t0 = time.perf_counter()
        fn()
        dt = round(time.perf_counter() - t0, 3)
        n_jobs = len(st.getJobIdsForGroup(group))
        spark.sparkContext.setJobGroup(None, None)
        return dt, n_jobs

    # ---- CC: old eager-checkpoint arm vs new lazy default ----------
    def cc(checkpoint_fn=None):
        noop(
            G.connected_components(
                pairs, "doc_a", "doc_b", checkpoint_fn=checkpoint_fn
            )
        )

    # ---- G01 loop: old two-join arm vs shipped pre-joined arm ------
    def g01_old():
        und = G._sym_src_edges(pairs)
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        pr = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
        for _ in range(G.PR_ITERS):
            contrib = (
                und.join(pr, und["src"] == pr["node"])
                .join(deg, "src")
                .select(
                    F.col("dst").alias("n2"),
                    (F.col("pr") / F.col("deg")).alias("c"),
                )
            )
            pr = contrib.groupBy(F.col("n2").alias("node")).agg(
                F.round(
                    F.lit(0.15) + F.lit(G.PR_DAMPING) * dsum("c", 38, 18), 9
                ).alias("pr")
            )
        noop(pr)

    def g01_new():
        und = G._sym_src_edges(pairs, with_deg=True)
        pr = und.select(F.col("src").alias("node")).distinct().select(
            "node", F.lit(1.0).alias("pr")
        )
        for _ in range(G.PR_ITERS):
            contrib = und.join(pr, und["src"] == pr["node"]).select(
                F.col("dst").alias("n2"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            pr = contrib.groupBy(F.col("n2").alias("node")).agg(
                F.round(
                    F.lit(0.15) + F.lit(G.PR_DAMPING) * dsum("c", 38, 18), 9
                ).alias("pr")
            )
        noop(pr)

    def g01_shj():
        # with_deg + SHUFFLE_HASH hint on the rank side: und is
        # checkpointed hash-partitioned on src and pr comes out of a
        # groupBy(node) at the same width, so the hinted join runs
        # with ZERO exchange and no broadcast-build job per iteration;
        # the groupBy(dst) exchange is each iteration's only shuffle.
        und = G._sym_src_edges(pairs, with_deg=True)
        pr = und.select(F.col("src").alias("node")).distinct().select(
            "node", F.lit(1.0).alias("pr")
        )
        for _ in range(G.PR_ITERS):
            contrib = und.join(
                pr.hint("shuffle_hash"), und["src"] == pr["node"]
            ).select(
                F.col("dst").alias("n2"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            pr = contrib.groupBy(F.col("n2").alias("node")).agg(
                F.round(
                    F.lit(0.15) + F.lit(G.PR_DAMPING) * dsum("c", 38, 18), 9
                ).alias("pr")
            )
        noop(pr)

    def g02_old():
        from pyspark.sql import Window as W

        und = G._sym_src_edges(pairs)
        labels = und.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("community")
        )
        for _ in range(G.LPA_ITERS):
            votes = (
                und.join(labels, und["src"] == labels["node"])
                .groupBy(F.col("dst").alias("n2"), "community")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            wv = W.partitionBy("n2").orderBy(
                F.col("cnt").desc(), F.col("community")
            )
            labels = (
                votes.withColumn("rn", F.row_number().over(wv))
                .filter(F.col("rn") == 1)
                .select(F.col("n2").alias("node"), "community")
            )
        noop(labels)

    def g02_shj_minby():
        # same SHUFFLE_HASH discipline + the argmax as a second
        # aggregate (min of (-cnt, community) struct — identical
        # (cnt DESC, community ASC) winner) instead of a row_number
        # window: the (n2, community) count partial-aggregates into
        # the same exchange and the per-node argmax needs no sort.
        und = G._sym_src_edges(pairs)
        labels = und.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("community")
        )
        for _ in range(G.LPA_ITERS):
            votes = (
                und.join(labels.hint("shuffle_hash"),
                         und["src"] == labels["node"])
                .groupBy(F.col("dst").alias("n2"), "community")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            best = F.min(F.struct((-F.col("cnt")).alias("neg"),
                                  F.col("community"))).alias("b")
            labels = votes.groupBy(F.col("n2").alias("node")).agg(
                best
            ).select("node", F.col("b.community").alias("community"))
        noop(labels)

    arms = {
        "cc_old": lambda: cc(lambda df: df.localCheckpoint(eager=True)),
        "cc_new": lambda: cc(None),
        "g01_old": g01_old,
        "g01_new": g01_new,
        "g01_shj": g01_shj,
        "g02_old": g02_old,
        "g02_shj": g02_shj_minby,
    }
    results = {k: [] for k in arms}
    jobs = {k: 0 for k in arms}
    for _ in range(reps):
        for k, fn in arms.items():
            dt, nj = run(k, fn)
            results[k].append(dt)
            jobs[k] = nj
    for k in arms:
        print(
            f"{k:8s} median {statistics.median(results[k]):6.3f}s "
            f"jobs={jobs[k]}  {results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
