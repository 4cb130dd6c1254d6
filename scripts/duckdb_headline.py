#!/usr/bin/env python
"""DuckDB side of the engine-vs-engine headline comparison
(BASELINE.md "Engine-vs-engine at sf0.1").

Runs the ORACLE SQL of every headline catalog query (bench.py's
HEADLINE list — the byte-identical answers the differential gate
pins) on DuckDB with 32 threads against the same sf0.1 parquet, with
the same median-of-REPS methodology as bench.py, so each round's
BENCH artifact can be read against a SAME-DAY baseline number
instead of a stale one (host speed drifts round to round; r7's box
ran the identical Spark plans ~25% slower than r6's).

Usage: python scripts/duckdb_headline.py  (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_REPS, SPARK_GRAFT_CPUS)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from omop_dump_to_parquet_spark import load_catalog  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _, oracles = load_catalog()

    con = duckdb.connect()
    con.sql(f"SET threads TO {threads}")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    missing = []
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            missing.append(name)
            continue
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = len(con.sql(sql).fetchall())
            runs.append(round(time.perf_counter() - t0, 3))
        raw[name] = runs
        timings[name] = round(statistics.median(runs), 3)
        print(
            f"# {name}: median {timings[name]:.3f}s of {runs} ({n} rows)",
            file=sys.stderr,
        )
    if missing:
        print(f"# no oracle (skipped): {missing}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "threads": threads,
                "reps": reps,
                "queries": timings,
                "raw_timings": raw,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
