#!/usr/bin/env python
"""Same-session paired A/B (r17, verdict #4): widen the PROBE side
(orders) of q25/q30 — the r16 round A/B'd (and reverted) widening
LINEITEM, which at fixture scale is the broadcast BUILD side; the
8→32-core scaling ratio of 1.17 on q30 says the broadcast-chain probe
is still nearly serial. Arms alternate A,B,A,B..., gc-quiesced,
noop-forced via forced_count (the bench's own forcing recipe).

    python scripts/r17_ab_q2530.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omop_dump_to_parquet_spark.force import forced_count
    from omop_dump_to_parquet_spark.operators.dedup import widen_scan
    from omop_dump_to_parquet_spark.session import get_spark
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_q2530")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().collect()

    def q25(widen: bool):
        cust = table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("2000-06-01").cast("timestamp")
        )
        if widen:
            orders = widen_scan(orders)
        li = table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("2000-06-01").cast("timestamp")
        )
        ext = F.col("l_extendedprice").cast("decimal(12,2)")
        disc = F.col("l_discount").cast("decimal(4,2)")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(ext * (F.lit(1) - disc)).cast("double").alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )

    def q30(widen: bool):
        cust = table(spark, sf_dir, "customer")
        orders = table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
        )
        if widen:
            orders = widen_scan(orders)
        li = table(spark, sf_dir, "lineitem")
        supp = table(spark, sf_dir, "supplier")
        nation = table(spark, sf_dir, "nation")
        region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
        ext = F.col("l_extendedprice").cast("decimal(12,2)")
        disc = F.col("l_discount").cast("decimal(4,2)")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .join(
                supp,
                (li.l_suppkey == supp.s_suppkey)
                & (cust.c_nationkey == supp.s_nationkey),
            )
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(F.sum(ext * (F.lit(1) - disc)).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("n_name"))
        )

    arms = {
        "q25_plain": lambda: q25(False),
        "q25_widen": lambda: q25(True),
        "q30_plain": lambda: q30(False),
        "q30_widen": lambda: q30(True),
    }
    results = {k: [] for k in arms}
    for _ in range(reps):
        for k, build in arms.items():
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            forced_count(build())
            results[k].append(round(time.perf_counter() - t0, 3))
    for k in arms:
        print(
            f"{k:10s} median {statistics.median(results[k]):6.3f}s "
            f"{results[k]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
