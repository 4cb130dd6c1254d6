#!/usr/bin/env python
"""Partitioning-determinism sweep (committed in r9; run ad hoc since
r5): every catalog query executed twice — once at 32 shuffle
partitions, once at 7 — and the results compared Spark-vs-Spark.

Pass = results are independent of partitioning/summation order, the
property that makes 1000-executor runs reproducible run-to-run (and
the same property the exact-DECIMAL accumulation + explicit
tie-breaks exist to provide). A float sum routed through a plain
double accumulator, or a window ordered on a non-unique key, shows up
here as a 32-vs-7 mismatch even when both runs individually look
plausible. Results land in PARTITION_DETERMINISM.json.

Usage:  python scripts/partition_determinism_sweep.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

WIDE, NARROW = "32", "7"


def main() -> int:
    import pandas as pd

    from test_parity import normalize

    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.session import (
        apply_runtime_confs,
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = load_catalog()

    sessions = {}
    for width in (WIDE, NARROW):
        s = spark.newSession()
        apply_runtime_confs(s)
        s.conf.set("spark.sql.shuffle.partitions", width)
        sessions[width] = s

    fails: list[str] = []
    t0 = time.time()
    for qid, fn in queries.items():
        try:
            wide = normalize(fn(sessions[WIDE], sf_dir).toPandas())
            narrow = normalize(fn(sessions[NARROW], sf_dir).toPandas())
            pd.testing.assert_frame_equal(wide, narrow, check_dtype=False)
        except Exception as ex:  # noqa: BLE001 — sweep reports
            fails.append(qid)
            print(f"UNSTABLE {qid}: {str(ex)[:200]}", flush=True)
    wall = round(time.time() - t0, 1)
    n = len(queries)
    print(f"{n - len(fails)}/{n} stable at {WIDE}-vs-{NARROW} shuffle "
          f"partitions in {wall}s; unstable: {fails}")
    spark.stop()

    out = os.path.join(os.path.dirname(__file__), "..",
                       "PARTITION_DETERMINISM.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "widths": [int(WIDE), int(NARROW)],
                "sf_dir": sf_dir,
                "stable": n - len(fails),
                "total": n,
                "unstable": fails,
                "wall_s": wall,
            },
            fh, indent=2,
        )
        fh.write("\n")
    print(f"-> {os.path.abspath(out)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
