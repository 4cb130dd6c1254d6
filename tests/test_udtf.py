"""Python UDTF surface (Spark 4): table-generating functions usable in
SQL LATERAL joins. The engine's stance is builtins-first — q29 shows
posexplode for plain fan-out — but semantics that need per-row
*stateful* expansion (parsers, segmenters) are UDTF-shaped, so the
registration path is pinned here.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="ngram: string, pos: int")
class CharBigrams:
    """Emit one row per character bigram — a stand-in for any
    stateful tokenizer that cannot be a single column expression."""

    def eval(self, text: str):
        if text is None:
            return
        for i in range(len(text) - 1):
            yield text[i : i + 2], i


def test_udtf_direct_call(spark):
    rows = CharBigrams(lit("spark")).collect()
    assert [(r.ngram, r.pos) for r in rows] == [
        ("sp", 0), ("pa", 1), ("ar", 2), ("rk", 3),
    ]


def test_udtf_lateral_join_in_sql(spark, sf_small):
    spark.udtf.register("char_bigrams", CharBigrams)
    spark.read.parquet(f"{sf_small}/documents.parquet").createOrReplaceTempView(
        "docs_udtf"
    )
    out = spark.sql(
        """
        SELECT d.doc_id, b.ngram, b.pos
        FROM docs_udtf d, LATERAL char_bigrams(substring(d.text, 1, 8)) b
        WHERE d.doc_id < 3
        """
    )
    pdf = out.toPandas()
    # every selected doc fans out to len(prefix)-1 = 7 bigrams
    assert len(pdf) == 3 * 7
    assert set(pdf["doc_id"]) == {0, 1, 2}
    assert all(len(g) == 2 for g in pdf["ngram"])
