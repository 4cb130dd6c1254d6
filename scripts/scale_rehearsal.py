#!/usr/bin/env python
"""Scale rehearsal: measure wall-time-vs-size exponents (r6 ask #1).

Runs the five ops the 100 TB arguments lean on hardest — d04 (MinHash
LSH near-dedup), d06 (pair→cluster connected components), g01
(PageRank over the similarity graph), d11 (verbatim overlap), t18
(two-pass heavy hitters) — over the ``.scale/x{1,3,10}`` fixtures
(``gen_scale_fixture.py``; dup-rate-realistic, planted pairs scale
linearly) and fits the per-op scaling exponent

    alpha = slope of log(wall time) vs log(rows)

via least squares over the three points. alpha ≈ 1 means the plan's
cost tracks data size (the claim SCALING.md argues analytically);
alpha ≫ 1 flags a hidden quadratic. Emits SCALE_REHEARSAL.json and a
markdown table for SCALING.md.

Methodology matches bench.py (median-of-3 since r7 — min-of-reps let
one lucky rep flip an exponent, the exact failure mode that retired
it for the headline bench) on one warm session, ops run
largest-scale-last so JVM warmup cannot flatter the big runs.
"""
from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 3
OPS = (
    "d04_dedup_minhash_lsh",
    "d06_dedup_clusters",
    "g01_pagerank",
    "d11_verbatim_overlap",
    "t18_heavy_hitters",
    # embedding family (x1/x3/x10 = 2k/6k/20k vectors)
    "s05_ann_ivf",
    "d10_semdedup",
    "d08_embedding_dedup_clusters",
)
SCALES = (1, 3, 10)


def main() -> None:
    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.operators.graph import LAST_CC_STATS
    from omop_dump_to_parquet_spark.session import get_spark

    root = os.path.join(os.path.dirname(__file__), "..", ".scale")
    queries, _ = load_catalog()
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {op: {"scales": {}} for op in OPS}
    for scale in SCALES:  # small → large: warmup cannot flatter x10
        sf_dir = os.path.join(root, f"x{scale}")
        for op in OPS:
            runs, rows, extra = [], None, {}
            for _ in range(REPS):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                rows = queries[op](spark, sf_dir).count()
                runs.append(round(time.perf_counter() - t0, 3))
                if op == "d06_dedup_clusters" and LAST_CC_STATS:
                    extra = dict(LAST_CC_STATS)
            results[op]["scales"][f"x{scale}"] = {
                "sec": round(statistics.median(runs), 3),
                "raw": runs,
                "rows_out": rows,
                **({"cc_stats": extra} if extra else {}),
            }
            print(
                f"x{scale} {op}: median {statistics.median(runs):.2f}s "
                f"of {runs}, "
                f"{rows} rows {extra or ''}",
                file=sys.stderr,
            )

    # least-squares slope of log(t) on log(n) over the three scales
    for op in OPS:
        pts = [
            (math.log(s), math.log(results[op]["scales"][f"x{s}"]["sec"]))
            for s in SCALES
        ]
        mx = sum(p[0] for p in pts) / len(pts)
        my = sum(p[1] for p in pts) / len(pts)
        slope = sum((x - mx) * (y - my) for x, y in pts) / sum(
            (x - mx) ** 2 for x, _ in pts
        )
        results[op]["alpha"] = round(slope, 3)
        # output-size exponent: is the WORK growing linearly too?
        r1 = results[op]["scales"]["x1"]["rows_out"]
        r10 = results[op]["scales"]["x10"]["rows_out"]
        results[op]["rows_alpha"] = (
            round(math.log(max(r10, 1) / max(r1, 1)) / math.log(10), 3)
        )

    out = os.path.join(os.path.dirname(__file__), "..", "SCALE_REHEARSAL.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)

    print("\n| op | x1 | x3 | x10 | time exponent α | output exponent |")
    print("|---|---|---|---|---|---|")
    for op in OPS:
        s = results[op]["scales"]
        print(
            f"| {op} | {s['x1']['sec']:.2f}s | {s['x3']['sec']:.2f}s "
            f"| {s['x10']['sec']:.2f}s | {results[op]['alpha']:.2f} "
            f"| {results[op]['rows_alpha']:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
