#!/usr/bin/env python
"""Same-session paired A/B (r17, verdict #3): the BPE pair —
  t22 learn: eager per-iteration checkpoints (r16) vs lazy (r17 —
      the next iteration's collect materializes; the LAST iteration's
      merge pass is never computed);
  t23 encode: the whole-stage-codegen expression chain (regexp char
      split + chained replace) vs a byte-identical Python kernel
      (mapInPandas — str.join/str.replace/hashlib.md5).
Equality of the kernel's rows vs the expression chain is asserted
before timing.

    python scripts/r17_ab_bpe.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def encode_kernel_df(docs, merges):
    """bpe_encode as a mapInPandas kernel — candidate implementation."""
    pats = [
        (f" {lft}  {rgt} ", f" {merged} ")
        for _, lft, rgt, merged, _c in merges
    ]

    def enc(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "n_ws_tokens": [],
                "n_bpe_symbols": [],
                "encoded_md5": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out["doc_id"].append(doc_id)
                if text is None:
                    out["n_ws_tokens"].append(None)
                    out["n_bpe_symbols"].append(None)
                    out["encoded_md5"].append(None)
                    continue
                if "|" in text:
                    raise RuntimeError(
                        "t23: document text contains the '|' "
                        "word-boundary sentinel; the encode would be "
                        "ambiguous"
                    )
                words = text.split(" ")
                rep = (
                    " " + "  |  ".join("  ".join(w) for w in words) + "  "
                )
                for a, b in pats:
                    rep = rep.replace(a, b)
                stripped = rep.strip(" ")
                out["n_ws_tokens"].append(len(words))
                out["n_bpe_symbols"].append(
                    len(stripped.split("  ")) - (len(words) - 1)
                )
                out["encoded_md5"].append(
                    hashlib.md5(stripped.encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        enc,
        "doc_id long, n_ws_tokens long, n_bpe_symbols long, "
        "encoded_md5 string",
    )


def main() -> None:
    from omop_dump_to_parquet_spark.operators import text as T
    from omop_dump_to_parquet_spark.session import get_spark
    from omop_dump_to_parquet_spark.sources.parquet import table

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r17_ab_bpe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = table(spark, sf_dir, "documents")

    def learn_old(docs_, iters=T.BPE_ITERS):
        vocab = (
            docs_.select(F.explode(T.tokens("text")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
        sym = vocab.select(
            "wc",
            F.concat(
                F.lit("  "), F.regexp_replace("word", "(?s)(.)", "$1  ")
            ).alias("rep"),
        ).localCheckpoint(eager=False)
        merges = []
        for i in range(1, iters + 1):
            lst = F.split(F.trim(F.col("rep")), "  ")
            fanned = (
                sym.select("wc", lst.alias("lst"))
                .filter(F.size("lst") > 1)
                .select(
                    "wc", "lst",
                    F.explode(
                        F.sequence(F.lit(1), F.size("lst") - 1)
                    ).alias("j"),
                )
            )
            top = (
                fanned.select(
                    F.element_at("lst", F.col("j")).alias("l"),
                    F.element_at("lst", F.col("j") + 1).alias("r"),
                    "wc",
                )
                .groupBy("l", "r")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            best = top[0]
            merges.append(
                (i, best["l"], best["r"], best["l"] + best["r"],
                 int(best["cnt"]))
            )
            sym = sym.withColumn(
                "rep",
                F.replace(
                    F.col("rep"),
                    F.lit(f" {best['l']}  {best['r']} "),
                    F.lit(f" {best['l']}{best['r']} "),
                ),
            ).localCheckpoint()  # EAGER — the r16 arm
        return merges

    merges = T.learn_bpe_merges(docs)
    assert merges == learn_old(docs), "learn arms diverge"

    # equality gate: kernel rows == expression rows
    a = sorted(
        map(tuple, T.bpe_encode(docs, merges).collect())
    )
    b = sorted(map(tuple, encode_kernel_df(docs, merges).collect()))
    print(f"encode equality: {a == b} ({len(a)} rows)", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    arms = {
        "learn_old": lambda: learn_old(docs),
        "learn_new": lambda: T.learn_bpe_merges(docs),
        "enc_expr": lambda: noop(T.bpe_encode(docs, merges)),
        "enc_kern": lambda: noop(encode_kernel_df(docs, merges)),
        "t23_full": lambda: noop(T.t23_bpe_encode(spark, sf_dir)),
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
