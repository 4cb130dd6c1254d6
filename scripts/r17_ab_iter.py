#!/usr/bin/env python
"""Same-session paired A/B (r17, verdict #6 — iterative collect
floors): d14/s07 (kmeans_exact now lazily checkpoints its input so
per-iteration update jobs and the final assign stop re-scanning
parquet + re-converting arrays) and s09 (two driver collects merged
into one + the same lazy checkpoint). Old arms replicated in-script;
job counts via setJobGroup + statusTracker.

    python scripts/r17_ab_iter.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omop_dump_to_parquet_spark.functions.deterministic import davg
    from omop_dump_to_parquet_spark.functions.vectors import (
        cosine_d,
        to_double_array,
    )
    from omop_dump_to_parquet_spark.operators import dedup as D
    from omop_dump_to_parquet_spark.operators import similarity as S
    from omop_dump_to_parquet_spark.session import get_spark
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_iter")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    def kmeans_old(emb, k, iters, dim=S.S07_DIM):
        init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
        cents = [[float(x) for x in r["emb"]] for r in init]
        for _ in range(iters):
            assigned = S._s07_assign(emb, cents)
            rows = (
                assigned.select(
                    "cluster", F.posexplode("emb").alias("pos", "x")
                )
                .groupBy("cluster", "pos")
                .agg(F.round(davg(F.col("x"), 38, 18), 9).alias("m"))
                .collect()
            )
            means = {}
            for r in rows:
                means.setdefault(int(r["cluster"]), [0.0] * dim)[
                    int(r["pos"])
                ] = float(r["m"])
            cents = [means.get(c, cents[c]) for c in range(k)]
        return S._s07_assign(emb, cents), cents

    def d14_old():
        emb = table(spark, sf_dir, "embeddings").select(
            "vec_id", to_double_array("embedding").alias("emb")
        )
        assigned, _ = kmeans_old(emb, D.D14_K, D.D14_ITERS)
        return D.semdedup_prune_bucketed(
            assigned.withColumnRenamed("cluster", "bucket"), D.SEMDEDUP_TAU
        )

    def s09_old():
        emb = table(spark, sf_dir, "embeddings").select(
            "vec_id", to_double_array("embedding").alias("emb")
        )
        seed_rows = sorted(
            emb.filter(
                (F.col("vec_id") >= S.N_QUERIES)
                & (F.col("vec_id") < S.N_QUERIES + S.PQ_TRAIN_N)
            ).collect(),
            key=lambda r: r["vec_id"],
        )
        probe_rows = sorted(
            emb.filter(F.col("vec_id") < S.N_QUERIES).collect(),
            key=lambda r: r["vec_id"],
        )
        sub = S.EMB_DIM // S.PQ_M
        lattice, ugrid = S.PQ_LATTICE, S.PQ_UGRID
        Utr = S._pq_unit_lattice_np(
            np.array([r["emb"] for r in seed_rows], dtype=np.float64)
        ).reshape(-1, S.PQ_M, sub)
        C = S._pq_train_np(Utr)
        p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
        Pu = S._pq_unit_lattice_np(
            np.array([r["emb"] for r in probe_rows], dtype=np.float64)
        ).reshape(len(probe_rows), S.PQ_M, sub)
        tables = ((Pu[:, :, None, :] * lattice - C[None]) ** 2).sum(-1)
        bc = spark.sparkContext.broadcast((p_ids, tables, C))
        refine = S.PQ_REFINE

        def kernel(batches):
            import numpy as _np
            import pandas as _pd

            ids_p, tabs, cbk = bc.value
            m, k, s = cbk.shape
            for pdf in batches:
                out = {"query_id": [], "neighbor_id": [], "approx_dist": []}
                if len(pdf):
                    X = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
                    sc_ = _np.abs(X).max(axis=1)
                    sc_[sc_ == 0] = 1.0
                    q8 = _np.rint(X / sc_[:, None] * 127)
                    n8 = _np.sqrt((q8 * q8).sum(axis=1))
                    n8[n8 == 0] = 1.0
                    U = _np.rint(q8 / n8[:, None] * ugrid).astype(_np.int64)
                    U = U.reshape(len(X), m, s)
                    d = ((U[:, :, None, :] * lattice - cbk[None]) ** 2).sum(-1)
                    codes = d.argmin(-1)
                    b_ids = pdf["vec_id"].to_numpy()
                    mi = _np.arange(m)
                    for i in range(len(ids_p)):
                        approx = tabs[i][mi[None, :], codes].sum(1)
                        cand = _np.nonzero(b_ids != ids_p[i])[0]
                        a = approx[cand]
                        order = _np.lexsort((b_ids[cand], a))[:refine]
                        for j in order:
                            out["query_id"].append(int(ids_p[i]))
                            out["neighbor_id"].append(int(b_ids[cand[j]]))
                            out["approx_dist"].append(int(a[j]))
                yield _pd.DataFrame(out)

        cand = emb.mapInPandas(
            kernel,
            schema="query_id long, neighbor_id long, approx_dist long",
        )
        w_adc = W.partitionBy("query_id").orderBy(
            F.col("approx_dist").asc(), F.col("neighbor_id")
        )
        shortlist = (
            cand.withColumn("adc_rank", F.row_number().over(w_adc))
            .filter(F.col("adc_rank") <= refine)
            .drop("adc_rank")
        )
        probes = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
        )
        rescored = (
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("emb").alias("nemb"),
            )
            .join(F.broadcast(shortlist), "neighbor_id")
            .join(F.broadcast(probes), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                "approx_dist",
                F.round(cosine_d(F.col("qemb"), F.col("nemb")), 6).alias(
                    "cos_sim"
                ),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= S.TOP_K)
            .select(
                "query_id", "neighbor_id", "approx_dist", "cos_sim", "rank"
            )
        )

    # equality gates (old arms ≡ shipped new paths)
    new_d14 = sorted(
        map(tuple, D.d14_semdedup_kmeans(spark, sf_dir).collect())
    )
    old_d14 = sorted(map(tuple, d14_old().collect()))
    print(f"d14 equality: {new_d14 == old_d14} ({len(new_d14)} rows)",
          flush=True)
    new_s09 = sorted(map(tuple, S.s09_ann_pq(spark, sf_dir).collect()))
    old_s09 = sorted(map(tuple, s09_old().collect()))
    print(f"s09 equality: {new_s09 == old_s09} ({len(new_s09)} rows)",
          flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    arms = {
        "d14_old": lambda: noop(d14_old()),
        "d14_new": lambda: noop(D.d14_semdedup_kmeans(spark, sf_dir)),
        "s09_old": lambda: noop(s09_old()),
        "s09_new": lambda: noop(S.s09_ann_pq(spark, sf_dir)),
    }
    results = {k: [] for k in arms}
    jobs = {k: 0 for k in arms}
    for rep in range(reps):
        for k, fn in arms.items():
            spark.sparkContext._jvm.System.gc()
            group = f"ab-{k}-{rep}"
            spark.sparkContext.setJobGroup(group, k)
            t0 = time.perf_counter()
            fn()
            results[k].append(round(time.perf_counter() - t0, 3))
            jobs[k] = len(st.getJobIdsForGroup(group))
            spark.sparkContext.setJobGroup(None, None)
    for k in arms:
        print(
            f"{k:8s} median {statistics.median(results[k]):6.3f}s "
            f"jobs={jobs[k]}  {results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
