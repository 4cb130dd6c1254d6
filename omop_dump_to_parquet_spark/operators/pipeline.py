"""End-to-end training-data manifest pipeline ([EXT]).

The individual catalog operators (quality scoring t02, exact dedup
d02, deterministic sampling t06, shard assignment t12) are the stages
a pre-training data pipeline runs; this module composes them into ONE
lineage — filter → dedup → sample → shard — the way a production job
actually ships a corpus. Composing matters for the engine story:
Catalyst plans the whole chain as one job (the quality filter and the
content hash compute in the same scan; nothing is materialized
between stages), which is exactly what a hand-rolled multi-tool
pipeline (reference-style: one script per stage, parquet between
each) cannot do.

The quality formula and the sample-threshold derivation are IMPORTED
from text.py (``quality_expr``/``QUALITY_SQL``, ``_sample_threshold``)
— single definitions shared with t02/t06, so a tuning change there
cannot silently diverge from this pipeline.

Scale: one scan of the corpus; two shuffles total (content-hash
dedup window, shard window) — both on uniform hash-derived keys.
Every intermediate is a column expression, not a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import table
from .text import QUALITY_SQL, _sample_threshold, quality_expr

#: Quality cutoff ≈ the fixture's median score (0.698 at both gate
#: scales) so the filter is discriminating, not vacuous.
P01_QUALITY_CUT = 0.70
#: Deterministic doc_id-hash sample (same mechanics as t06 —
#: reproducible across engines, runs, and partitionings).
P01_SAMPLE_SEED = 777
P01_SAMPLE_FRACTION = 0.75
P01_SAMPLE_THRESHOLD = _sample_threshold(P01_SAMPLE_FRACTION)

P01_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, text,
         {QUALITY_SQL} AS quality
  FROM documents
),
kept AS (
  SELECT * FROM scored WHERE quality >= {P01_QUALITY_CUT}
),
deduped AS (
  SELECT doc_id, quality FROM (
    SELECT doc_id, quality,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
),
sampled AS (
  SELECT doc_id, quality
  FROM deduped
  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':{P01_SAMPLE_SEED}'), 1, 3)
        < '{P01_SAMPLE_THRESHOLD}'
),
sharded AS (
  SELECT doc_id, quality,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM sampled
)
SELECT doc_id,
       CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS INT) AS shard,
       row_number() OVER (PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id)
         AS pos,
       round(quality, 6) AS quality
FROM sharded
"""


@query("p01_training_manifest", oracle=P01_ORACLE)
def p01_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality-filter → exact-dedup keep-first → deterministic hash
    sample → shard assignment, as one Catalyst-planned lineage."""
    docs = table(spark, sf_dir, "documents")

    kept = docs.select(
        "doc_id", "text", quality_expr().alias("quality")
    ).filter(F.col("quality") >= P01_QUALITY_CUT)

    dedup_w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "quality")
    )

    bucket = F.substring(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{P01_SAMPLE_SEED}"))
        ),
        1,
        3,
    )
    sampled = deduped.filter(bucket < F.lit(P01_SAMPLE_THRESHOLD))

    sharded = sampled.withColumn(
        "h", F.md5(F.col("doc_id").cast("string"))
    )
    shard = F.expr(
        "cast(instr('0123456789abcdef', substr(h, 1, 1)) - 1 as int)"
    )
    shard_w = W.partitionBy(F.substring("h", 1, 1)).orderBy("h", "doc_id")
    return sharded.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(shard_w).alias("pos"),
        F.round("quality", 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# P02 — incremental ingest dedup: admit only documents from an
# incoming batch whose content does not already exist in the lake
# (and keep one copy of content duplicated WITHIN the batch). This is
# the steady-state form of corpus building — d01/d02 dedup a corpus
# once; real pipelines dedup every new crawl INCREMENTALLY against
# everything already ingested. Fixture split: even doc_ids play the
# existing lake, odd doc_ids the incoming batch.
#
# Scale shape: the lake side reduces to DISTINCT digests (one
# uniform-key shuffle, and at 100 TB the digest set is stored as its
# own compacted column table — this operator only ever reads
# digests, never lake text). The anti join shuffles both sides on
# digest — uniform by construction; no broadcast hint because the
# lake digest set GROWS with the lake (broadcasting it is the
# mistake; AQE may still choose broadcast while the batch is small).
# Spark's runtime bloom-filter injection (session.py thresholds)
# gives the shuffle-side pre-prune a real pipeline would add
# explicitly. Within-batch keep-first is the d02 window on the same
# digest partitioning the anti join just established.
# ---------------------------------------------------------------------------

P02_ORACLE = """
WITH lake AS (
  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 2 = 0
),
incoming AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 2 = 1
),
novel AS (
  SELECT i.doc_id, i.digest
  FROM incoming i LEFT JOIN lake l USING (digest)
  WHERE l.digest IS NULL
)
SELECT doc_id, digest FROM (
  SELECT doc_id, digest,
         row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
  FROM novel
) WHERE rn = 1
"""


@query("p02_incremental_ingest_dedup", oracle=P02_ORACLE)
def p02_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    lake = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("digest")
    )
    novel = incoming.join(lake, "digest", "left_anti")
    keep_first = W.partitionBy("digest").orderBy("doc_id")
    return (
        novel.withColumn("rn", F.row_number().over(keep_first))
        .filter(F.col("rn") == 1)
        .select("doc_id", "digest")
    )
