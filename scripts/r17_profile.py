#!/usr/bin/env python
"""Per-operator timing + Spark JOB-COUNT attribution (r17 optimization
round). The r16 verdict's top items are all job-count floors (d06/g01
per-iteration actions, t22/t23 collect-per-round, d14/s09 collects), so
this harness reports, for each target, the median wall time to the noop
sink (guide §1.4) AND the number of Spark jobs one run submits — the
quantity the fixes must move. Jobs are counted via setJobGroup +
statusTracker (public API).

    python scripts/r17_profile.py [reps] [target1,target2,...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.force import forced_count
    from omop_dump_to_parquet_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    targets = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else [
            "d06_dedup_clusters",
            "g01_pagerank",
            "g02_label_propagation",
            "g03_triangle_count",
            "d03_dedup_ngram_jaccard",
            "d07_dedup_shingle_jaccard",
            "d14_semdedup_kmeans",
            "s07_kmeans_clusters",
            "s09_ann_pq",
            "t22_bpe_merges",
            "t23_bpe_encode",
        ]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = load_catalog()

    # warm (bench.py recipe)
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy(
        "r_name"
    ).count().collect()

    st = spark.sparkContext.statusTracker()
    for name in targets:
        fn = queries[name]
        runs, jobs = [], []
        for rep in range(reps):
            spark.sparkContext._jvm.System.gc()
            group = f"r17prof-{name}-{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            forced_count(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(st.getJobIdsForGroup(group)))
            spark.sparkContext.setJobGroup(None, None)
        print(
            f"{name:28s} median {statistics.median(runs):7.3f}s "
            f"jobs={jobs[-1]}  {runs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
