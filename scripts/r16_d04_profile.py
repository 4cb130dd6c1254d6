#!/usr/bin/env python
"""Stage-level timing attribution for d04 (r16 optimization round).

Times each subtree of the d04 pipeline to the noop sink (guide §1.4)
so the sink never pollutes the measurement, with per-stage job
descriptions (§1.5). Median of N reps, gc-quiesced like bench.py.

    python scripts/r16_d04_profile.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omop_dump_to_parquet_spark.operators import dedup as D
    from omop_dump_to_parquet_spark.session import get_spark
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("d04_profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timeit(label, build):
        runs = []
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"d04-profile: {label}")
            t0 = time.perf_counter()
            noop(build())
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{label:34s} median {statistics.median(runs):7.3f}s  {runs}")

    # warm (bench.py recipe)
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy(
        "r_name"
    ).count().collect()

    from fractions import Fraction

    ratio = Fraction(str(D.MINHASH_THRESHOLD))

    def sigs():
        nw_df = docs.select(
            "doc_id",
            F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("nw"),
        )
        return D.minhash_signatures(docs).join(nw_df, "doc_id")

    timeit("1 signatures+nw", sigs)
    timeit(
        "2 candidates (sigs->pairs)",
        lambda: D.d04_candidate_pairs(docs),
    )
    timeit(
        "3 full d04 (cand+verify)",
        lambda: D.d04_dedup_minhash_lsh(spark, sf_dir),
    )
    # verify alone over a materialized candidate set
    cands = D.d04_candidate_pairs(docs).localCheckpoint(eager=True)
    timeit(
        "4 verify (broadcast)",
        lambda: D.verify_jaccard_pairs(
            docs, cands, D.MINHASH_THRESHOLD, use_broadcast=True
        ),
    )


if __name__ == "__main__":
    main()
