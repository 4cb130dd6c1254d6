#!/usr/bin/env python
"""Same-session paired A/B (r17): d04's LSH candidate generation as a
per-bucket NumPy kernel vs the shipped interpreted first-band
self-join. Same semantics: size-ratio prune, hot-bucket cap (own
bucket locally, earlier bands via a driver-collected capped dict —
bounded by pigeonhole), first-shared-surviving-band emission. The
candidate SET must be exactly equal before timing counts.

    python scripts/r17_ab_d04kernel.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def kernel_candidates(spark, reps, bands, size_ratio, max_bucket, n_groups):
    num, den = size_ratio
    banded = reps.select(
        "doc_id", "nw", "keys", F.posexplode("keys").alias("band", "bkey")
    )
    capped_rows = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "bkey")
        .collect()
    )
    capped: dict[int, set] = {}
    for r in capped_rows:
        capped.setdefault(int(r["band"]), set()).add(int(r["bkey"]))
    bc = spark.sparkContext.broadcast(capped)

    def pair_batches(pdf):
        import numpy as np
        import pandas as pd

        cap_map = bc.value
        out_a, out_b = [], []
        if len(pdf) > 1:
            B = int(pdf["band"].iloc[0])
            order = np.argsort(pdf["bkey"].to_numpy(), kind="stable")
            ids = pdf["doc_id"].to_numpy()[order]
            nw = pdf["nw"].to_numpy()[order]
            K = np.stack(pdf["keys"].to_numpy()[order]).astype(np.int64)
            bk = pdf["bkey"].to_numpy()[order]
            # earlier-band capped mask (bands 0..B-1)
            mask = np.zeros((len(ids), B), dtype=bool) if B else None
            for j in range(B):
                cj = cap_map.get(j)
                if cj:
                    mask[:, j] = np.isin(
                        K[:, j], np.fromiter(cj, dtype=np.int64)
                    )
            starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
            ends = np.r_[starts[1:], len(bk)]
            for s, e in zip(starts, ends):
                m = e - s
                if m < 2 or m > max_bucket:
                    continue
                for i in range(s, e - 1):
                    js = np.arange(i + 1, e)
                    ok = (nw[i] * den >= nw[js] * num) & (
                        nw[js] * den >= nw[i] * num
                    )
                    if B:
                        shared = (
                            (K[i, :B][None, :] == K[js, :B])
                            & ~mask[i, :B][None, :]
                            & ~mask[js, :B]
                        ).any(axis=1)
                        ok &= ~shared
                    sel = js[ok]
                    if len(sel):
                        lo = np.minimum(ids[i], ids[sel])
                        hi = np.maximum(ids[i], ids[sel])
                        out_a.append(lo)
                        out_b.append(hi)
        if out_a:
            import numpy as np

            return pd.DataFrame(
                {
                    "doc_a": np.concatenate(out_a),
                    "doc_b": np.concatenate(out_b),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
            }
        )

    grouped = banded.withColumn(
        "g", F.pmod(F.xxhash64("bkey"), F.lit(n_groups))
    )
    return grouped.groupBy("band", "g").applyInPandas(
        pair_batches, "doc_a long, doc_b long"
    )


def main() -> None:
    from omop_dump_to_parquet_spark.operators import dedup as D
    from omop_dump_to_parquet_spark.session import (
        get_shuffle_partitions,
        get_spark,
    )
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_d04kernel")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = table(spark, sf_dir, "documents")
    prepared = D.minhash_prepared(docs).localCheckpoint(eager=True)
    grouped = D.d04_grouped(docs, prepared).localCheckpoint(eager=True)
    reps = grouped.select(F.col("gid").alias("doc_id"), "nw", "keys")
    ratio = Fraction(str(D.MINHASH_THRESHOLD))
    sr = (ratio.numerator, ratio.denominator)
    n_groups = get_shuffle_partitions(spark)

    cur = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_candidate_pairs(
            reps, size_ratio=sr, prekeyed=True
        ).collect()
    }
    ker = {
        (r["doc_a"], r["doc_b"])
        for r in kernel_candidates(
            spark, reps, D.LSH_BANDS, sr, D.MAX_BUCKET, n_groups
        ).collect()
    }
    print(
        f"candidate equality: {cur == ker} "
        f"(cur {len(cur)}, kernel {len(ker)})",
        flush=True,
    )
    if cur != ker:
        print("  only cur:", list(cur - ker)[:5])
        print("  only ker:", list(ker - cur)[:5])
        return

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    arms = {
        "cand_cur": lambda: noop(
            D.lsh_candidate_pairs(reps, size_ratio=sr, prekeyed=True)
        ),
        "cand_ker": lambda: noop(
            kernel_candidates(
                spark, reps, D.LSH_BANDS, sr, D.MAX_BUCKET, n_groups
            )
        ),
    }
    results = {k: [] for k in arms}
    for _ in range(reps_n):
        for k, fn in arms.items():
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            results[k].append(round(time.perf_counter() - t0, 3))
    for k in arms:
        print(
            f"{k:9s} median {statistics.median(results[k]):6.3f}s "
            f"{results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
