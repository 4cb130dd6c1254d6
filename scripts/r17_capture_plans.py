#!/usr/bin/env python
"""Capture .explain("formatted") for named catalog queries into
plans/r17/<name>_<tag>.txt — the r16 optimization round's evidence
that plan-shape claims in OPTIMIZATION_r16.md match the code.

    python scripts/r17_capture_plans.py before q01_pricing_summary,...
    python scripts/r17_capture_plans.py after  all-headline
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HEADLINE = [
    "q01_pricing_summary",
    "q03_join_inner",
    "q07_star_broadcast",
    "q13_topk",
    "q25_shipping_priority",
    "q30_local_supplier_volume",
    "w02_window_running",
    "w04_sessionization",
    "w05_asof_join",
    "d02_dedup_hash_keep_first",
    "d04_dedup_minhash_lsh",
    "s01_knn_bruteforce",
    "s06_ann_int8",
    "t02_quality_score",
    "q29_lateral_explode",
    "m02_decode_features",
]


def main() -> None:
    from omop_dump_to_parquet_spark import load_catalog
    from omop_dump_to_parquet_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEADLINE
    if names == ["all-headline"]:
        names = HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = load_catalog()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = queries[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({text.count('Exchange')} Exchange tokens)")


if __name__ == "__main__":
    main()
