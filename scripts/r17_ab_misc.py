#!/usr/bin/env python
"""r17 misc measurements:
  - widen_scan's driver-side partition probe cost (verdict hygiene #9)
  - s01/s06: the GEMM/cosine probe runs inside the fixture's single
    scan split — widen A/B (verdict #7's quiet-box re-measure)
  - d07 phase attribution (checkpoint build / census+candidates /
    verify) to scope verdict #2's "≤2s" ask

    python scripts/r17_ab_misc.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
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
    spark = get_spark("r17_ab_misc")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    # ---- widen_scan partition-probe cost --------------------------
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        docs.rdd.getNumPartitions()
        times.append(time.perf_counter() - t0)
    print(
        f"widen probe: median {statistics.median(times) * 1000:.1f}ms "
        f"min {min(times) * 1000:.1f}ms max {max(times) * 1000:.1f}ms",
        flush=True,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- s01 plain vs widened probe side --------------------------
    def s01(widen: bool):
        emb = table(spark, sf_dir, "embeddings").select(
            "vec_id", to_double_array("embedding").alias("emb")
        )
        corpus = D.widen_scan(emb) if widen else emb
        queries = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
        )
        scored = (
            corpus.crossJoin(F.broadcast(queries))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias(
                    "cos_sim"
                ),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= S.TOP_K)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
        )

    # ---- s06 plain vs widened kernel input ------------------------
    import numpy as np

    def s06(widen: bool):
        emb = table(spark, sf_dir, "embeddings").select(
            "vec_id", to_double_array("embedding").alias("emb")
        )
        probe_rows = emb.filter(F.col("vec_id") < S.N_QUERIES).collect()
        p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
        P = np.array([r["emb"] for r in probe_rows], dtype=np.float64)
        p_scales = np.abs(P).max(axis=1)
        p_scales[p_scales == 0] = 1.0
        Pq = np.rint(P / p_scales[:, None] * 127).astype(np.int8)
        pn = np.sqrt((Pq.astype(np.float64) ** 2).sum(axis=1))
        pn[pn == 0] = 1.0
        bc = spark.sparkContext.broadcast((p_ids, Pq.astype(np.int32), pn))
        top_k = S.TOP_K

        def kernel(batches):
            import numpy as _np
            import pandas as _pd

            ids_p, Pi, pn_p = bc.value
            for pdf in batches:
                out = {"query_id": [], "neighbor_id": [], "cos_sim_q": []}
                if len(pdf):
                    B = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
                    scales = _np.abs(B).max(axis=1)
                    scales[scales == 0] = 1.0
                    Bq = _np.rint(B / scales[:, None] * 127).astype(_np.int8)
                    bn = _np.sqrt((Bq.astype(_np.float64) ** 2).sum(axis=1))
                    bn[bn == 0] = 1.0
                    Sm = (Pi @ Bq.astype(_np.int32).T) / _np.outer(pn_p, bn)
                    Sm = _np.round(Sm, 6)
                    b_ids = pdf["vec_id"].to_numpy()
                    for i in range(len(ids_p)):
                        cand = _np.nonzero(b_ids != ids_p[i])[0]
                        s = Sm[i][cand]
                        order = _np.lexsort((b_ids[cand], -s))[:top_k]
                        for j in order:
                            out["query_id"].append(int(ids_p[i]))
                            out["neighbor_id"].append(int(b_ids[cand[j]]))
                            out["cos_sim_q"].append(float(s[j]))
                yield _pd.DataFrame(out)

        src = D.widen_scan(emb) if widen else emb
        cand = src.mapInPandas(
            kernel,
            schema="query_id long, neighbor_id long, cos_sim_q double",
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim_q").desc(), F.col("neighbor_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "neighbor_id", "cos_sim_q", "rank")
        )

    # equality gates
    for name, fn in (("s01", s01), ("s06", s06)):
        a = sorted(map(tuple, fn(False).collect()))
        b = sorted(map(tuple, fn(True).collect()))
        print(f"{name} widen equality: {a == b} ({len(a)} rows)", flush=True)

    # ---- d07 phases ------------------------------------------------
    from fractions import Fraction

    ratio7 = Fraction(str(D.SHINGLE_THRESHOLD))

    def d07_ckpt():
        return D.widen_scan(
            docs.sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "source", "text")
        ).select(
            "doc_id", "lang", "source",
            D.word_shingles(F.col("text"), D.SHINGLE_N).alias("toks"),
        )

    def d07_cand():
        docs_sh = d07_ckpt().localCheckpoint(eager=False)
        return D.prefix_filter_candidates(
            docs_sh, ratio7.numerator, ratio7.denominator,
            "lang", "source", tokens=F.col("toks"),
        )

    arms = {
        "s01_plain": lambda: noop(s01(False)),
        "s01_widen": lambda: noop(s01(True)),
        "s06_plain": lambda: noop(s06(False)),
        "s06_widen": lambda: noop(s06(True)),
        "d07_ckpt": lambda: noop(d07_ckpt()),
        "d07_cand": lambda: noop(d07_cand()),
        "d07_full": lambda: noop(
            D.d07_dedup_shingle_jaccard(spark, sf_dir)
        ),
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
            f"{k:10s} median {statistics.median(results[k]):6.3f}s "
            f"{results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
