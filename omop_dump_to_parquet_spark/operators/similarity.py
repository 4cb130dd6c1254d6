"""Similarity search over the ``embeddings`` table
(``array<float>``, dim 64). [EXT] operators per SURVEY.md §2.3 —
absent from the reference (§2.2), mandated by the north-star brief:

- S01 brute-force cosine top-k (the exactness baseline),
- S02 random-hyperplane LSH bucketed ANN (the scale path),
- S03 per-label vector statistics,
- S04 embedding-cosine near-dup pairs (the embedding member of the
  dedup family).

Scale story: brute force is O(|Q|·|C|) — correct only when one side is
small (broadcast the queries). The LSH variant hashes both sides into
sign-pattern buckets so each probe compares against |C|/2^planes
candidates in expectation; recall is tunable by multi-probing /
OR-ing several hash tables. All vector math is built-in column
expressions over double arrays (functions/vectors.py) — JVM codegen,
no Python.

Determinism: ranking orders by ROUND(cos, 6) with vec_id tie-break so
both engines select identical top-k sets regardless of FP noise.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_d, dot_d, l2norm_d, to_double_array
from ..registry import query
from ..sources.parquet import table

N_QUERIES = 5  # vec_id < 5 are the probe vectors
TOP_K = 5

# ---------------------------------------------------------------------------
# S01 — brute-force cosine top-k.
# ---------------------------------------------------------------------------

S01_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round(list_dot_product(q.qemb, v.emb)
               / (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 6) AS cos_sim
  FROM q, v
  WHERE v.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("s01_knn_bruteforce", oracle=S01_ORACLE)
def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# S02 — LSH-bucketed ANN (random hyperplanes, sign-pattern buckets).
# Planes are generated from a fixed seed at plan-build time and shipped
# as literals — deterministic across runs, which makes the op fully
# differential-testable despite being "approximate": the oracle
# recomputes the IDENTICAL buckets from the same literal hyperplanes
# in SQL (the d10 recipe) and ranks by the same rounded cosine with
# the same id tie-break. "Approximate" here means approximate W.R.T.
# the exact top-k (s01), not nondeterministic — recall vs s01 remains
# a unit-test property, exact bucket/rank agreement is the oracle's.
# ---------------------------------------------------------------------------


N_PLANES = 6
EMB_DIM = 64


def _hyperplanes(n: int = N_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    rng = random.Random(42)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n)]


def bucket_id(emb_col, n_planes: int = N_PLANES) -> F.Column:
    """Sign-pattern bucket id from ``n_planes`` fixed hyperplanes
    (a prefix of the seed-42 set, so fewer planes = coarser buckets
    of the same family)."""
    planes = _hyperplanes(n_planes)
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        proj = dot_d(emb_col, F.array(*[F.lit(x) for x in plane]))
        acc = acc + F.when(proj >= 0, F.lit(1 << i)).otherwise(0)
    return acc


def bucket_sql(n_planes: int, col: str = "emb") -> str:
    """DuckDB expression computing the same sign-pattern bucket id as
    ``bucket_id`` from the same literal hyperplanes — shared by the
    s02 and d10 oracles so Spark and SQL can never see different
    bucket families."""
    terms = []
    for i, plane in enumerate(_hyperplanes(n_planes)):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(
            f"(CASE WHEN list_dot_product({col}, [{lits}]) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


S02_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
b AS (
  SELECT vec_id, emb, {bucket_sql(N_PLANES)} AS bucket FROM v
),
q AS (
  SELECT vec_id AS query_id, emb AS qemb, bucket AS qbucket
  FROM b WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qemb, b.emb)
               / (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
  FROM q JOIN b ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("s02_ann_lsh", oracle=S02_ORACLE)
def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    bucketed = emb.withColumn("bucket", bucket_id(F.col("emb")))
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    # Probe only the query's own bucket: |C|/2^planes candidates each.
    scored = (
        bucketed.join(
            F.broadcast(queries), F.col("bucket") == F.col("qbucket")
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# S03 — per-label vector statistics (corpus health profiling).
# Per-row norms are deterministic; the cross-row average is rounded at
# 6 decimals (noise ~1e-13 ≪ quantum).
# ---------------------------------------------------------------------------

S03_ORACLE = """
WITH v AS (
  SELECT label, sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       round(AVG(nrm), 6) AS avg_norm,
       MIN(nrm) AS min_norm,
       MAX(nrm) AS max_norm
FROM v GROUP BY label
"""


@query("s03_vector_stats", oracle=S03_ORACLE)
def s03_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "label", l2norm_d(to_double_array("embedding")).alias("nrm")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# S04 — embedding-cosine near-dup pairs (cos ≥ threshold, a < b).
# Exact all-pairs via a cogrouped block-pair GEMM: both sides stay
# distributed, the shuffle is O(n·blocks) replicated rows, and each
# block pair is one NumPy matrix multiply.
# ---------------------------------------------------------------------------

COS_DUP_THRESHOLD = 0.5

S04_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.emb, b.emb)
             / (sqrt(list_dot_product(a.emb, a.emb))
                * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb))
               * sqrt(list_dot_product(b.emb, b.emb))), 6) >= {COS_DUP_THRESHOLD}
"""


GEMM_BLOCKS = 8  # corpus row-blocks; block-pair fan-out = B(B+1)/2


@query("s04_dedup_embedding", oracle=S04_ORACLE)
def s04_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine ≥ threshold via cogrouped block-pair GEMM.

    Pairwise scoring through per-pair column expressions is
    interpreted (higher-order functions don't enter codegen) —
    measured 70s at sf0.1; a BLAS GEMM does the identical arithmetic
    in milliseconds.

    Both sides stay distributed: the corpus is hashed into ``blocks``
    row-blocks (``vec_id % B``), the constant upper-triangular
    block-pair table (B(B+1)/2 rows) is broadcast-joined against both
    sides, and a cogrouped ``applyInPandas`` runs one NumPy GEMM per
    block pair. Every unordered vector pair lands in exactly one
    block pair, so the result is exact — identical arithmetic to
    one-sided brute force — while the shuffle moves O(n·B) replicated
    rows, never O(n²) pairs, and nothing is collected to the driver.
    At 100 TB, B scales with corpus size so each block fits an Arrow
    batch (rows/B × dim doubles); the kernel is unchanged. B is the
    MEMORY knob, not a work knob — the op is exact all-pairs, so
    total cosines stay O(n²); sub-quadratic needs the bucketed
    family (d10/s02/s05). Measured at 30× fixture scale (60k
    vectors): B=8 dies of GC pressure (7.5k-row blocks → 450 MB
    score matrices × concurrent kernels), B=64 runs it comfortably —
    exactly the scale-B-with-corpus rule, now a parameter
    (``cosine_pair_gemm``) instead of prose.
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    return cosine_pair_gemm(emb, COS_DUP_THRESHOLD, GEMM_BLOCKS)


def cosine_pair_gemm(
    emb: DataFrame, threshold: float, blocks: int = GEMM_BLOCKS
) -> DataFrame:
    """Exact cosine-≥-threshold pairs over ``(vec_id, emb)`` via the
    block-pair GEMM; ``blocks`` bounds per-kernel memory
    ((n/blocks)² score doubles) and must grow with the corpus."""
    spark = emb.sparkSession
    nb = blocks
    emb_b = emb.withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(nb)).cast("int")
    )
    pairs = spark.createDataFrame(
        [(i, j, i * nb + j) for i in range(nb) for j in range(i, nb)],
        "bi int, bj int, pair_id int",
    )
    left = (
        emb_b.alias("el")
        .join(F.broadcast(pairs.alias("pl")), F.col("el.blk") == F.col("pl.bi"))
        .select(
            F.col("pl.pair_id").alias("pair_id"),
            F.col("el.vec_id").alias("vec_id"),
            F.col("el.emb").alias("emb"),
        )
    )
    right = (
        emb_b.alias("er")
        .join(F.broadcast(pairs.alias("pr")), F.col("er.blk") == F.col("pr.bj"))
        .select(
            F.col("pr.pair_id").alias("pair_id"),
            F.col("er.vec_id").alias("vec_id"),
            F.col("er.emb").alias("emb"),
        )
    )

    def gemm(key, ldf, rdf):
        import numpy as _np
        import pandas as _pd

        empty = _pd.DataFrame(
            {
                "vec_a": _np.array([], dtype=_np.int64),
                "vec_b": _np.array([], dtype=_np.int64),
                "cos_sim": _np.array([], dtype=_np.float64),
            }
        )
        if not len(ldf) or not len(rdf):
            return empty
        bi, bj = divmod(int(key[0]), nb)
        A = _np.stack(ldf["emb"].to_numpy()).astype(_np.float64)
        B = _np.stack(rdf["emb"].to_numpy()).astype(_np.float64)
        a_ids = ldf["vec_id"].to_numpy()
        b_ids = rdf["vec_id"].to_numpy()

        # Exactness contract (r10 review): BLAS GEMM sums products in
        # a blocked order, the engines' list_dot_product/F.aggregate
        # fold LEFT-TO-RIGHT — results differ by ulps, so a cosine
        # within ~1e-16 of a round-6 boundary (or of the threshold)
        # could flip between kernel and oracle. The GEMM is therefore
        # only the PREFILTER. The margin must cover BOTH the ulp drift
        # AND the half-step of the round-6 keep rule: a cosine in
        # [thr-5e-7, thr) ROUNDS UP into the kept set, so a margin
        # narrower than 0.5e-6 would mask out pairs the oracle keeps
        # (r10 adversarial re-review of this very refactor).
        #
        # r11 scale fix: the r10 version sequential-folded EVERY
        # margin survivor — pair-sized work (A[ii] fancy-index copies
        # of P×dim doubles) that took d10 3.2s→31s and d08 37s→66s at
        # the ×10 rehearsal once the clustered fixture pushed ~20M
        # pairs past the prefilter. But the fold can only change the
        # 6-dp result when the GEMM value sits within the fold DRIFT
        # of a rounding boundary: |gemm − fold| ≤ dim·2⁻⁵²·‖a‖‖b‖ /
        # (norms) ≈ 1.4e-14 for 64 dims — so pairs ≥1e-9 (a 70,000×
        # safety factor) from the nearest round-half boundary round
        # identically from either value and need NO recompute. Only
        # the ambiguous sliver (~0.2% at a uniform phase) pays the
        # sequential fold; the decision rule is unchanged, bit-equal
        # to both engines, and the n²-sized scan stays BLAS.
        def _seq_dot(X, Y):
            acc = _np.zeros(len(X), dtype=_np.float64)
            for k in range(X.shape[1]):
                acc = acc + X[:, k] * Y[:, k]
            return acc

        an = _np.sqrt(_seq_dot(A, A))
        bn = _np.sqrt(_seq_dot(B, B))
        S = (A @ B.T) / _np.outer(an, bn)
        mask = S >= threshold - 1e-6
        if bi == bj:
            # diagonal block: same set on both sides — keep each
            # unordered pair once and drop the self-pair
            mask &= a_ids[:, None] < b_ids[None, :]
        ii, jj = _np.nonzero(mask)
        if not len(ii):
            return empty
        g = S[ii, jj]
        r = g * 1e6
        ambiguous = _np.abs(r - _np.floor(r) - 0.5) < 1e-3  # ±1e-9 cos
        cos = _np.round(g, 6)
        if ambiguous.any():
            ia, ja = ii[ambiguous], jj[ambiguous]
            cos[ambiguous] = _np.round(
                _seq_dot(A[ia], B[ja]) / (an[ia] * bn[ja]), 6
            )
        keep = cos >= threshold
        ii, jj, cos = ii[keep], jj[keep], cos[keep]
        if not len(ii):
            return empty
        # off-diagonal blocks are disjoint id sets; normalize to a<b
        va = _np.minimum(a_ids[ii], b_ids[jj])
        vb = _np.maximum(a_ids[ii], b_ids[jj])
        return _pd.DataFrame(
            {"vec_a": va, "vec_b": vb, "cos_sim": cos}
        )

    return (
        left.groupBy("pair_id")
        .cogroup(right.groupBy("pair_id"))
        .applyInPandas(gemm, schema="vec_a long, vec_b long, cos_sim double")
    )


# ---------------------------------------------------------------------------
# S05 — IVF-style ANN: coarse quantization into cells; the corpus is
# indexed by its single nearest cell, each probe searches its
# IVF_NPROBE nearest cells (multi-probe recovers the recall lost at
# cell borders — the standard IVF accuracy knob). Cells here are
# cosine-nearest of NLIST seed centroids (the first NLIST vectors —
# deterministic; a production build k-means-trains them). Fully
# differential since r5 (S05_ORACLE below rebuilds the identical
# index in SQL); cell-assignment totality, rank contiguity, and
# recall vs brute force additionally asserted in unit tests.
# Scale: assignment is map-side; the per-cell search is the same
# bounded-block pattern as S02 — candidates shrink ~NLIST/NPROBE× per
# probe.
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 2

_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

# Full differential oracle (r5): the seed centroids are ROWS OF THE
# TABLE (vec_id < NLIST), so SQL reproduces the whole index build —
# cell assignment is argmax unrounded cosine with cell-id tie-break
# (the identical (−cos, cell) sort order as the Spark plan; both
# engines fold the dot product left-to-right, the s01/d10 precedent),
# multi-probe is crn ≤ NPROBE over the same ranking, and the final
# top-k uses the rounded-cosine/id contract.
S05_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c AS (SELECT vec_id AS cell, emb AS cemb FROM v WHERE vec_id < {IVF_NLIST}),
ranked_cells AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_COS.format(a="v.emb", b="c.cemb")} DESC, c.cell
         ) AS crn
  FROM v CROSS JOIN c
),
assigned AS (SELECT vec_id, cell FROM ranked_cells WHERE crn = 1),
probes AS (
  SELECT vec_id AS query_id, cell AS qcell
  FROM ranked_cells WHERE vec_id < {N_QUERIES} AND crn <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({_COS.format(a="q.emb", b="n.emb")}, 6) AS cos_sim
  FROM probes p
  JOIN assigned a ON a.cell = p.qcell AND a.vec_id <> p.query_id
  JOIN v q ON q.vec_id = p.query_id
  JOIN v n ON n.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("s05_ann_ivf", oracle=S05_ORACLE)
def s05_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    cents = [
        (r["vec_id"], r["emb"])
        for r in emb.filter(F.col("vec_id") < IVF_NLIST).collect()
    ]
    # cells ranked by cosine(emb, centroid) descending:
    # ascending sort on (-cos, cell_id) → deterministic ranking.
    # NULL cosine (a zero-norm seed centroid — cosine_d's documented
    # degenerate case) coalesces to +inf so it ranks LAST, matching
    # the oracle's row_number(ORDER BY cos DESC) with NULLS LAST;
    # a bare NULL struct field would sort FIRST in Spark's ascending
    # struct order and grab every assignment (r10 review).
    scored = [
        F.struct(
            F.coalesce(
                -cosine_d(
                    F.col("emb"), F.array(*[F.lit(x) for x in c_emb])
                ),
                F.lit(float("inf")),
            ).alias("neg_cos"),
            F.lit(int(c_id)).alias("cell"),
        )
        for c_id, c_emb in cents
    ]
    ranked_cells = F.sort_array(F.array(*scored))
    assigned = emb.withColumn("cell", ranked_cells[0]["cell"])
    queries = (
        assigned.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qemb"),
            F.explode(
                F.slice(ranked_cells, 1, IVF_NPROBE)
            ).alias("probe"),
        )
        .select("query_id", "qemb", F.col("probe.cell").alias("qcell"))
    )
    scored_pairs = (
        assigned.join(F.broadcast(queries), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored_pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# S06 — int8-quantized top-k ANN: per-vector symmetric quantization
# (q = round(127·x/max|x|)), scoring on int8 via the same broadcast
# GEMM as S04. The quantization scale cancels in cosine, so scores
# approximate full-precision cosine to ~1/127 per component.
# THE 100 TB lever: the broadcast corpus and every scan shrink 8×
# (float64 → int8), and int8 GEMM is memory-bandwidth-bound — this is
# the standard serving layout (FAISS SQ8).
#
# Full differential oracle (r5): every step of the quantized scoring
# is reproducible in SQL — np.rint is banker's rounding, which DuckDB
# spells round_even(x, 0); the int8 dot is exact integer arithmetic
# (≤ 64·127², exact in doubles); norms and the final round-6 ranking
# follow the s01 contract. Top-k agreement vs exact s01 additionally
# asserted in tests.
# ---------------------------------------------------------------------------

S06_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
sc AS (
  SELECT vec_id, emb,
         CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 1.0
              ELSE list_max(list_transform(emb, x -> abs(x))) END AS s
  FROM v
),
q8 AS (
  SELECT vec_id,
         list_transform(emb, x -> round_even(x / s * 127, 0)) AS qv
  FROM sc
),
nrm AS (
  SELECT vec_id, qv,
         CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 THEN 1.0
              ELSE sqrt(list_dot_product(qv, qv)) END AS n
  FROM q8
),
p AS (
  SELECT vec_id AS query_id, qv AS pv, n AS pn
  FROM nrm WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(p.pv, c.qv) / (p.pn * c.n), 6) AS cos_sim_q
  FROM p JOIN nrm c ON c.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_sim_q, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim_q DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("s06_ann_int8", oracle=S06_ORACLE)
def s06_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 top-k ANN: the N_QUERIES probe vectors are quantized on the
    driver (bounded collect — N_QUERIES rows, same class as S05's
    NLIST centroids) and broadcast; the corpus NEVER leaves the
    executors. Each Arrow batch quantizes its slice, runs the int8
    GEMM probe × batch, and emits only a per-batch local top-k
    (rounded score desc, id asc — the same total order the final
    global window ranks by, so the local prune is lossless). The
    reduce is top_k × n_batches candidate rows, not the corpus.
    """
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    probe_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    P = np.array([r["emb"] for r in probe_rows], dtype=np.float64)
    p_scales = np.abs(P).max(axis=1)
    p_scales[p_scales == 0] = 1.0
    Pq = np.rint(P / p_scales[:, None] * 127).astype(np.int8)
    pn = np.sqrt((Pq.astype(np.float64) ** 2).sum(axis=1))
    pn[pn == 0] = 1.0
    bc = spark.sparkContext.broadcast((p_ids, Pq.astype(np.int32), pn))
    top_k = TOP_K

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        ids_p, Pi, pn_p = bc.value
        for pdf in batches:
            out = {"query_id": [], "neighbor_id": [], "cos_sim_q": []}
            if len(pdf):
                B = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
                scales = _np.abs(B).max(axis=1)
                scales[scales == 0] = 1.0
                Bq = _np.rint(B / scales[:, None] * 127).astype(_np.int8)
                bn = _np.sqrt((Bq.astype(_np.float64) ** 2).sum(axis=1))
                bn[bn == 0] = 1.0
                # int32 accumulation of the int8 dot, then normalize
                S = (Pi @ Bq.astype(_np.int32).T) / _np.outer(pn_p, bn)
                S = _np.round(S, 6)
                b_ids = pdf["vec_id"].to_numpy()
                for i in range(len(ids_p)):
                    keep = b_ids != ids_p[i]  # exclude self
                    cand = _np.nonzero(keep)[0]
                    s = S[i][cand]
                    order = _np.lexsort((b_ids[cand], -s))[:top_k]
                    for j in order:
                        out["query_id"].append(int(ids_p[i]))
                        out["neighbor_id"].append(int(b_ids[cand[j]]))
                        out["cos_sim_q"].append(float(s[j]))
            yield _pd.DataFrame(out)

    cand = emb.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, cos_sim_q double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim_q").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cos_sim_q", "rank")
    )


# ---------------------------------------------------------------------------
# S07 — k-means clustering over the embedding corpus: deterministic
# Lloyd, DIFFERENTIALLY CHECKED (r6, the g01 unrolled-iteration
# recipe; previously MLlib with a rows-only check). Five Lloyd
# iterations with cross-engine lockstep at every step:
#   init      — centroids = the K smallest vec_ids' embeddings (the
#               fixture id space is dense; any deterministic pick
#               works — k-means++ would need a cross-engine RNG).
#   assign    — argmin_c round(|c|² − 2·x·c, 6), built from the
#               dot-product primitive proven ULP-identical across
#               engines (functions/vectors.py); |x|² drops out of the
#               argmin. Ties (after rounding) break to the smallest
#               cluster id in both engines (array_position /
#               row_number ORDER BY key, cluster).
#   update    — per-dim mean via exact DECIMAL(38,18) sums (davg),
#               rounded to 9 decimals so both engines enter the next
#               iteration with bit-identical centroids (g01's
#               round-9 lockstep). Empty clusters keep their previous
#               centroid.
# The oracle unrolls the same five iterations as chained CTEs.
#
# Scale shape unchanged: each iteration is one map (assign — k×dim
# literal broadcast inside codegen, no join) + one partial-agg
# shuffle (k×dim decimal sums); the only driver state is the k×dim
# centroid matrix (bounded — the same contract as s05's IVF
# centroids). MLlib's KMeans drops in for production use where
# cross-engine reproducibility isn't required; Lloyd-in-DataFrame is
# what makes the op auditable here.
# ---------------------------------------------------------------------------

KMEANS_K = 8
LLOYD_ITERS = 5
S07_DIM = 64  # fixture embedding dim; asserted against data in tests


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Strict sequential left-fold dot product — the Python twin of
    ``dot_d``'s ``aggregate(zip_with(a,b,*), 0.0, +)`` (same IEEE ops
    in the same order, so the value is bit-identical; fsum/numpy
    would NOT be)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _s07_assign(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Add ``cluster`` = argmin over centroids of the rounded distance
    key |c|² − 2·x·c (ties → smallest cluster index).

    The centroid matrix rides in as BROADCAST DATA (one row,
    array<array<double>>), not as literals: per-iteration literals
    change the plan and force a fresh whole-stage-codegen compile per
    iteration (measured: the literal formulation spent ~15s of a 17s
    run compiling 6 one-off plans at sf0.01); with constant plan
    structure the generated code is compiled once and every iteration
    reuses it. Assign stays map-only — a 1-row broadcast nested-loop
    join is a map-side operator, no shuffle of the corpus.

    |c|² is constant per centroid, so it is folded DRIVER-side and
    carried in the broadcast row rather than re-folded per
    row×centroid in the hot map (r12: halves the interpreted-HOF work
    of the per-row scan — measured assign 2.4s → 1.3s warm at ×10).
    Bit-identity with the oracle's list_dot_product(cent, cent) is
    preserved because Python's sequential sum is the same strict
    left-fold over the same doubles as dot_d's aggregate (and dot_d
    vs DuckDB is the ULP-identity proven in functions/vectors.py
    tests)."""
    spark = emb.sparkSession
    c2 = [_seq_dot(c, c) for c in cents]
    crow = spark.createDataFrame(
        [([list(c) for c in cents], c2)],
        "ca array<array<double>>, c2 array<double>",
    )
    dists = F.transform(
        F.col("ca"),
        lambda c, i: F.round(
            F.element_at(F.col("c2"), i + F.lit(1))
            - 2 * dot_d(F.col("emb"), c),
            6,
        ),
    )
    return (
        emb.crossJoin(F.broadcast(crow))
        .withColumn(
            "cluster",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("long"),
        )
        .drop("ca", "c2")
    )


def kmeans_oracle_prefix(k: int, iters: int, dim: int = S07_DIM) -> str:
    """Unrolled-Lloyd CTE prefix (DuckDB): ``WITH v, c0, a0, m0, c1,
    …, a{iters}`` where ``a{iters}(vec_id, emb, cluster)`` is the
    final assignment and ``c{iters}(cluster, cent)`` the final
    centroids — the s07 exact-decimal lockstep recipe as a reusable
    prefix, shared by s07 (K=8, 5 iters) and d14 (the SemDeDup
    k-means bucketing certification, K=8, 2 iters). Same arithmetic
    contract as the Spark twin :func:`kmeans_exact`: assign by
    ``round(|c|² − 2·x·c, 6)`` with ties to the smallest cluster,
    update by exact DECIMAL(38,18) sums rounded to 9 decimals."""
    assign = """
a{t} AS (
  SELECT vec_id, emb, cluster FROM (
    SELECT v.vec_id, v.emb, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(list_dot_product(c.cent, c.cent)
                            - 2 * list_dot_product(v.emb, c.cent), 6),
                      c.cluster) AS rn
    FROM v CROSS JOIN c{t} c) t{t}
  WHERE rn = 1
)"""
    update = f"""
m{{t}} AS (
  SELECT cluster, i,
         round(CAST(SUM(CAST(emb[i] AS DECIMAL(38,18))) AS DOUBLE)
               / COUNT(emb[i]), 9) AS m
  FROM a{{t}} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) r{{t}}
  GROUP BY cluster, i
),
c{{t1}} AS (
  SELECT c.cluster, COALESCE(g.cent, c.cent) AS cent
  FROM c{{t}} c LEFT JOIN (
    SELECT cluster, list(m ORDER BY i) AS cent FROM m{{t}} GROUP BY cluster
  ) g ON c.cluster = g.cluster
)"""
    parts = [
        f"""WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c0 AS (
  SELECT vec_id AS cluster, emb AS cent FROM v WHERE vec_id < {k}
)"""
    ]
    for t in range(iters):
        parts.append(assign.format(t=t))
        parts.append(update.format(t=t, t1=t + 1))
    parts.append(assign.format(t=iters))
    return ",".join(parts)


def _s07_oracle() -> str:
    return (
        kmeans_oracle_prefix(KMEANS_K, LLOYD_ITERS, S07_DIM)
        + f"""
SELECT a.cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       round(sqrt(list_dot_product(c.cent, c.cent)), 6) AS centroid_norm
FROM a{LLOYD_ITERS} a JOIN c{LLOYD_ITERS} c ON a.cluster = c.cluster
GROUP BY a.cluster, c.cent
"""
    )


S07_ORACLE = _s07_oracle()


def kmeans_exact(
    emb: DataFrame, k: int, iters: int, dim: int = S07_DIM
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic exact-decimal Lloyd over ``(vec_id, emb)`` —
    the s07 cross-engine lockstep contract as a reusable helper
    (shared by s07 and d14): init = the embeddings of vec_ids
    0..k-1, assign = argmin of ``round(|c|² − 2·x·c, 6)`` with ties
    to the smallest cluster, update = per-dim mean via exact
    DECIMAL(38,18) sums rounded to 9 decimals. Returns the final
    ``(vec_id, emb, cluster)`` DataFrame plus the final centroid
    list. The SQL twin is :func:`kmeans_oracle_prefix`."""
    from ..functions.deterministic import davg

    # Within-run materialization (r17, guide §5 — the d04/d11
    # pattern): every Lloyd iteration's update job, the init collect,
    # and the final assign otherwise each re-scan the parquet and
    # re-run the array conversion. Lazy localCheckpoint: the init
    # collect below is the materializing action; iters+1 downstream
    # passes read the checkpointed rows. (r17 losing A/B, recorded:
    # widen_scan before the checkpoint — parallelizing the fixture's
    # single-split assign/update passes — measured d14 3.31s → 3.66s;
    # the exchange of the embedding rows costs more than the
    # parallelism buys at this size.) Computed from the parquet
    # inputs on every invocation — nothing persists across runs.
    emb = emb.localCheckpoint(eager=False)
    # Bounded driver state: k initial centroids, then k×dim means per
    # iteration — the same contract as s05's IVF centroid collect.
    init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    # The oracle uses vec_id AS the cluster id while this side indexes
    # centroids by collect position — sound only while the first K
    # vec_ids are exactly 0..K-1. Fail loudly if the fixture's id
    # space ever turns sparse instead of crashing (IndexError below)
    # or silently diverging from the oracle.
    got_ids = [r["vec_id"] for r in init]
    if got_ids != list(range(k)):  # not assert: survives -O
        raise ValueError(
            f"kmeans_exact requires dense vec_ids 0..{k - 1} (oracle "
            f"keys clusters by vec_id); fixture has {got_ids}"
        )
    cents = [[float(x) for x in r["emb"]] for r in init]
    for _ in range(iters):
        assigned = _s07_assign(emb, cents)
        # Update step as posexplode → one decimal agg over (cluster,
        # pos) instead of 64 per-dimension agg columns: identical
        # arithmetic (exact DECIMAL(38,18) sums are summation-order
        # independent, so the per-dim mean is bit-identical), but the
        # expression tree shrinks from 64 decimal-avg columns to one —
        # the r11 catalog audit measured ~0.9s/iter of driver-side
        # Column construction plus ~1.3s/iter of Catalyst analysis on
        # the wide form (a compile CONSTANT, paid even at sf0.001).
        # Shuffle volume is unchanged: partial agg combines each map
        # partition to ≤ k×dim rows either way. Collect stays bounded
        # driver state (k×dim = 512 rows).
        rows = (
            assigned.select("cluster", F.posexplode("emb").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(davg(F.col("x"), 38, 18), 9).alias("m"))
            .collect()
        )
        means: dict[int, list[float]] = {}
        filled: dict[int, int] = {}
        for r in rows:
            means.setdefault(int(r["cluster"]), [0.0] * dim)[
                int(r["pos"])
            ] = float(r["m"])
            filled[int(r["cluster"])] = filled.get(int(r["cluster"]), 0) + 1
        # Fail loudly if any non-empty cluster came back with fewer
        # than `dim` (cluster, pos) rows — a NULL element or a short
        # embedding array would otherwise leave a coordinate silently
        # at the 0.0 placeholder, diverging from the oracle where the
        # old wide form raised (r12 advisor note).
        short = {c: n for c, n in filled.items() if n != dim}
        if short:
            raise ValueError(
                f"kmeans_exact update: clusters with != {dim} mean "
                f"rows (NULL/short embedding in fixture?): {short}"
            )
        cents = [means.get(c, cents[c]) for c in range(k)]
    return _s07_assign(emb, cents), cents


@query("s07_kmeans_clusters", oracle=S07_ORACLE)
def s07_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    final, cents = kmeans_exact(emb, KMEANS_K, LLOYD_ITERS, S07_DIM)
    norms = spark.createDataFrame(
        [(c, list(v)) for c, v in enumerate(cents)],
        "cluster long, cent array<double>",
    ).select(
        "cluster",
        F.round(F.sqrt(dot_d(F.col("cent"), F.col("cent"))), 6).alias(
            "centroid_norm"
        ),
    )
    return (
        final.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .join(F.broadcast(norms), "cluster")
    )


def kmeans_bucket_assign(
    emb: DataFrame, k: int, iters: int = 3
) -> DataFrame:
    """K∝N k-means bucketing for :func:`~.dedup.semdedup_prune_bucketed`
    — the SemDeDup paper's own clustering step (one k-means over the
    corpus, K chosen so the average cell holds ~100 vectors), as the
    scale path for density-concentrated corpora where hyperplane
    bucketing stops splitting (SCALING.md "x100": a tight cluster
    shares its sign pattern under any hyperplane, so its bucket grows
    with the corpus; Voronoi cells cut through dense blobs).

    Returns ``(vec_id, emb, bucket)``. Each Lloyd iteration is one
    numpy-GEMM assign pass (``mapInPandas``; the k×dim centroid
    matrix rides in the pickled closure — bounded driver state, the
    s05/s07 collect contract) plus one posexplode partial-agg shuffle
    for the means. Deterministic for a fixed partitioning: init is
    the k smallest vec_ids, argmin ties break to the smallest bucket
    index; UNLIKE s07 (oracle-pinned exact-DECIMAL lockstep at fixed
    K=8) the means are plain doubles — this is a bucketing utility,
    not a differentially-checked query, and bucket borders are a
    recall knob exactly as in s02/s05.

    Cost caveat: with K ∝ N the flat assign is N×K GEMM — quadratic
    (measured α 1.38 end-to-end at ×100). Production corpora should
    use :func:`kmeans_bucket_assign_2level` (N·√K per level, α 0.61
    measured); this flat form is the building block and fine for
    bounded K."""
    import numpy as np

    init = emb.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init)}")
    cents = np.stack([list(r["emb"]) for r in init]).astype(np.float64)
    dim = cents.shape[1]

    def _assigned(C: "np.ndarray") -> DataFrame:
        c2 = (C * C).sum(axis=1)

        def assign(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                if not len(pdf):
                    continue
                A = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
                # argmin_c |c|^2 - 2 x·c  (|x|^2 drops out); numpy
                # argmin returns the FIRST minimum -> smallest bucket
                b = _np.argmin(c2[None, :] - 2.0 * (A @ C.T), axis=1)
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "emb": pdf["emb"],
                        "bucket": b.astype(_np.int64),
                    }
                )

        return emb.mapInPandas(
            assign, schema="vec_id long, emb array<double>, bucket long"
        )

    for _ in range(iters):
        rows = (
            _assigned(cents)
            .select("bucket", F.posexplode("emb").alias("pos", "x"))
            .groupBy("bucket", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )  # bounded: k×dim rows
        new = cents.copy()  # empty cells keep their previous centroid
        for r in rows:
            new[int(r["bucket"]), int(r["pos"])] = float(r["m"])
        cents = new
    return _assigned(cents)


def kmeans_bucket_assign_2level(
    emb: DataFrame, k: int, iters: int = 3
) -> DataFrame:
    """Two-level K∝N k-means bucketing: route through ~√K coarse
    cells, then ~√K fine centroids WITHIN the routed cell — the IVF
    coarse-quantizer structure (s05), applied to the clustering that
    feeds :func:`~.dedup.semdedup_prune_bucketed`.

    Why: the flat assign is N×K GEMM work, quadratic when K ∝ N
    holds cell population constant (measured: the flat path's x100
    wall is assign-dominated, SCALING.md "x100"). Two levels cost
    2·N·√K — with L levels N·K^(1/L), approaching linear as levels
    grow; two suffice through ~10⁹ vectors at GEMM constants. The
    prune's own pair work is unchanged (cell population is still
    ~N/K).

    Deterministic like the flat path: per-cell init is the cell's
    smallest vec_ids (groups are sorted before init), argmin ties
    break to the smallest index. Fine buckets are ``cell·k_fine +
    fine`` so ids stay disjoint across cells. The fine codebook
    (k×dim) rides in the assign closure — bounded driver state at
    catalog scale; at 10⁶+ total centroids ship it as a broadcast
    join instead (documented, not needed here)."""
    import math as _math

    import numpy as np

    k_coarse = max(1, _math.isqrt(k))
    k_fine = max(1, -(-k // k_coarse))  # ceil

    # Pin the coarse assignment before it is consumed by TWO separate
    # actions (the applyInPandas collect that builds the fine codebook,
    # then the returned mapInPandas): without the barrier the coarse
    # lineage — including its numpy argmin — would be recomputed for
    # the second action, and a BLAS/batching ulp flipping an argmin
    # tie between runs would hand assign_fine a cell that was empty
    # during the codebook pass (KeyError in fine_mats). localCheckpoint
    # is the d06/g01 pattern; eager=False defers materialization to
    # the codebook collect (r12 advisor note).
    coarse = kmeans_bucket_assign(emb, k_coarse, iters).localCheckpoint(
        eager=False
    )

    def cell_kmeans(pdf):
        import numpy as _np
        import pandas as _pd

        pdf = pdf.sort_values("vec_id")  # deterministic init
        cell = int(pdf["bucket"].iloc[0])
        A = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
        kf = min(k_fine, len(A))
        C = A[:kf].copy()
        for _ in range(iters):
            c2 = (C * C).sum(axis=1)
            b = _np.argmin(c2[None, :] - 2.0 * (A @ C.T), axis=1)
            for j in range(kf):  # empty fine cells keep their centroid
                sel = b == j
                if sel.any():
                    C[j] = A[sel].mean(axis=0)
        return _pd.DataFrame(
            {
                "cell": _np.full(kf, cell, dtype=_np.int64),
                "fine": _np.arange(kf, dtype=_np.int64),
                "cent": list(C),
            }
        )

    fine_rows = (
        coarse.groupBy("bucket")
        .applyInPandas(cell_kmeans, schema="cell long, fine long, cent array<double>")
        .collect()
    )  # bounded: ≤ k×dim driver state
    by_cell: dict[int, "np.ndarray"] = {}
    for r in fine_rows:
        by_cell.setdefault(int(r["cell"]), []).append(
            (int(r["fine"]), list(r["cent"]))
        )
    fine_mats = {
        c: np.stack([cent for _, cent in sorted(rows_)]).astype(np.float64)
        for c, rows_ in by_cell.items()
    }
    kf_out = k_fine

    def assign_fine(it):
        import numpy as _np
        import pandas as _pd

        f2 = {c: (M * M).sum(axis=1) for c, M in fine_mats.items()}
        for pdf in it:
            if not len(pdf):
                continue
            out_bucket = _np.empty(len(pdf), dtype=_np.int64)
            A = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
            cells = pdf["bucket"].to_numpy()
            for c in _np.unique(cells):
                sel = cells == c
                M = fine_mats[int(c)]
                b = _np.argmin(
                    f2[int(c)][None, :] - 2.0 * (A[sel] @ M.T), axis=1
                )
                out_bucket[sel] = int(c) * kf_out + b
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "emb": pdf["emb"],
                    "bucket": out_bucket,
                }
            )

    return coarse.mapInPandas(
        assign_fine, schema="vec_id long, emb array<double>, bucket long"
    )


# ---------------------------------------------------------------------------
# S08 — radius (range) search: ALL neighbors of each probe vector
# within a cosine-similarity radius, not a fixed top-k. The retrieval
# mode dedup-adjacent pipelines actually run ("give me everything
# within tau of this document"), complementing S01's top-k.
#
# Scale shape: identical to S01 — the probe set is tiny and
# broadcast, the corpus side streams through one codegen'd
# BroadcastNestedLoopJoin stage with the radius predicate applied
# before anything shuffles; output size is data-dependent but each
# corpus partition emits independently (no global ordering, no
# window, no shuffle at all). At 100 TB the corpus scan dominates and
# parallelizes perfectly; for repeated probe batches the LSH/IVF
# variants (S02/S05) bound the scanned fraction instead.
#
# Determinism: the radius predicate compares ROUND(cos, 6) so both
# engines make identical in/out decisions at the boundary.
# ---------------------------------------------------------------------------

# Calibrated against the fixture's cosine distribution (probe-corpus
# max ≈ 0.40, p99 ≈ 0.29 at sf0.01) so the result set is non-trivial
# — a radius in S04's near-dup regime (0.5) returns ~0 rows here.
RANGE_RADIUS = 0.25

S08_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < {N_QUERIES})
SELECT q.query_id, v.vec_id AS neighbor_id,
       round(list_dot_product(q.qemb, v.emb)
             / (sqrt(list_dot_product(q.qemb, q.qemb))
                * sqrt(list_dot_product(v.emb, v.emb))), 6) AS cos_sim
FROM q, v
WHERE v.vec_id <> q.query_id
  AND round(list_dot_product(q.qemb, v.emb)
            / (sqrt(list_dot_product(q.qemb, q.qemb))
               * sqrt(list_dot_product(v.emb, v.emb))), 6) >= {RANGE_RADIUS}
"""


@query("s08_range_search", oracle=S08_ORACLE)
def s08_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    probes = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    return (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= RANGE_RADIUS)
    )


# ---------------------------------------------------------------------------
# S09 — product-quantization ANN (PQ/ADC, Jégou et al. 2011 — the
# third member of the FAISS index family next to IVF (s05) and SQ8
# (s06)): split each vector into PQ_M subvectors, quantize each
# against a PQ_K-entry per-subspace codebook, and score queries via
# asymmetric distance computation — one (M × K) lookup table per
# query, corpus scored by M table lookups per vector instead of a
# 64-dim float product.
#
# THE 100 TB lever beyond SQ8: codes are PQ_M bytes per vector (16
# here — 4× under int8, 32× under float64), so a billion-vector
# index is ~16 GB and scan cost is table-lookup-bound.
#
# FULLY DIFFERENTIAL since r7 (previously the one similarity op with
# a rows-only check). The trick is an INTEGER-LATTICE formulation:
# every vector is quantized onto an integer grid through scalar IEEE
# steps both engines perform identically (the s06 recipe — np.rint ≡
# DuckDB round_even; max/abs/division/sqrt-of-integer are all exact
# or correctly rounded), codebook training is k-means whose state is
# (integer component sums, counts) — integer addition is order-free,
# so no decimal machinery is needed — with centroids snapped to a
# 1/PQ_LATTICE sub-grid via floor(s·L/n) (exact: |s|·L ≤
# n·(UGRID+1)·L ≈ 2.1e9 ≪ 2^53, so the product is exactly
# representable in double and the division correctly rounded, and
# the true quotient sits ≥ 1/n ≈ 2e-3 away from integer boundaries
# vs ulp ≈ 5e-7), and every assignment / ADC
# distance is an exact int64 (bounded by 4·(2·UGRID·LATTICE)² ≈
# 2.8e14 per subspace, Σ over M ≈ 4.5e15 < 2^53) — so argmins,
# shortlists, and the emitted approx_dist carry ZERO float ambiguity
# and the oracle reproduces them bit-for-bit. Recall vs exact s01 is
# still pinned by unit tests and the every-round s10 gate.
# ---------------------------------------------------------------------------

PQ_M = 16  # subspaces (EMB_DIM/PQ_M = 4 dims each)
PQ_K = 32  # codewords per subspace → 5 bits; stored as 1 byte each
PQ_TRAIN_N = 512  # driver-side training sample (bounded, deterministic)
PQ_TRAIN_ITERS = 8  # Lloyd iterations per subspace (unrolled in SQL)
PQ_REFINE = 50  # ADC shortlist size per query, exact-re-ranked
PQ_UGRID = 16384  # unit-sphere lattice: u = rint(q8/|q8| · 2^14)
PQ_LATTICE = 256  # centroid sub-grid: c = floor(sum·256/count)


def _pq_unit_lattice_np(X):
    """float64 (n, dim) → int64 unit-sphere lattice vectors, via
    q8 = rint(x/max|x|·127); u = rint(q8/|q8|·PQ_UGRID).

    Cross-engine-exact by construction: max/abs are exact, each
    division and multiply is one correctly-rounded IEEE op on
    identical operands (·127 and ·2^14 — the latter exact outright),
    |q8| = sqrt of an exact integer, and np.rint ≡ DuckDB round_even
    (the s06 precedent, driver-hash-proven since r5). Unit
    normalization is what makes squared L2 rank-equivalent to cosine
    (2 − 2·cos on unit vectors); the intermediate q8 step exists so
    the norm is computed from INTEGERS (a float-vector norm would
    hang on summation order)."""
    import numpy as np

    s = np.abs(X).max(axis=1)
    s[s == 0] = 1.0
    q8 = np.rint(X / s[:, None] * 127)
    n8 = np.sqrt((q8 * q8).sum(axis=1))
    n8[n8 == 0] = 1.0
    return np.rint(q8 / n8[:, None] * PQ_UGRID).astype(np.int64)


def _pq_train_np(U):
    """(n_train, M, sub) int64 u-lattice → (M, K, sub) int64 codebook
    on the PQ_LATTICE sub-grid. State per (m, k) is (component-sum,
    count) — exact integers, so member ORDER never matters; empty
    clusters keep their previous state; assignment distance is exact
    int64 with first-min (= smallest k) tie-break, matching the
    oracle's row_number ORDER BY d, k."""
    import numpy as np

    n_train = U.shape[0]
    if n_train < PQ_K:  # data contract, not a debug check: survives -O
        raise ValueError(f"PQ needs ≥{PQ_K} training rows, got {n_train}")
    S = U[:PQ_K].transpose(1, 0, 2).copy()  # (M, K, sub) component sums
    n = np.ones((PQ_M, PQ_K), dtype=np.int64)
    UT = U.transpose(1, 0, 2)  # (M, n_train, sub)

    def grid(S_, n_):
        return np.floor(S_ * float(PQ_LATTICE) / n_[..., None]).astype(
            np.int64
        )

    for _ in range(PQ_TRAIN_ITERS):
        C = grid(S, n)
        D = ((UT[:, :, None, :] * PQ_LATTICE - C[:, None, :, :]) ** 2).sum(-1)
        A = D.argmin(-1)  # (M, n_train); first min ⇒ smallest k
        for m in range(PQ_M):
            sm = np.zeros_like(S[m])
            nm = np.zeros(PQ_K, dtype=np.int64)
            np.add.at(sm, A[m], UT[m])
            np.add.at(nm, A[m], 1)
            upd = nm > 0
            S[m][upd] = sm[upd]
            n[m][upd] = nm[upd]
    return grid(S, n)


def _s09_oracle() -> str:
    """The full PQ pipeline — quantize, train (unrolled), encode,
    ADC, shortlist, exact re-rank — as one DuckDB query. Every CTE
    mirrors a step of the Spark plan 1:1; all comparisons are on
    exact BIGINT distances, so there is no per-iteration rounding
    lockstep to maintain (contrast s07, which needs decimal means)."""
    sub = EMB_DIM // PQ_M
    L, G = PQ_LATTICE, PQ_UGRID

    def d2(a: str, b: str) -> str:  # squared lattice distance, 4 dims
        return " + ".join(
            f"({a}.x{i}*{L} - {b}.c{i})*({a}.x{i}*{L} - {b}.c{i})"
            for i in range(1, sub + 1)
        )

    xs = ", ".join(
        f"uv[{m_expr}*{sub}+{i}] AS x{i}"
        for m_expr in ("m",)
        for i in range(1, sub + 1)
    )
    parts = [
        f"""WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
sc AS (
  SELECT vec_id, emb,
         CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 1.0
              ELSE list_max(list_transform(emb, x -> abs(x))) END AS s
  FROM v
),
q8 AS (
  SELECT vec_id, list_transform(emb, x -> round_even(x / s * 127, 0)) AS qv
  FROM sc
),
un AS (
  SELECT vec_id, qv,
         CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 THEN 1.0
              ELSE sqrt(list_dot_product(qv, qv)) END AS n8
  FROM q8
),
u AS (
  SELECT vec_id,
         list_transform(qv, x -> CAST(round_even(x / n8 * {G}, 0) AS BIGINT))
           AS uv
  FROM un
),
subv AS (
  SELECT vec_id, CAST(m AS INT) AS m, {xs}
  FROM u CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m)
),
tr AS (
  SELECT * FROM subv
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_TRAIN_N}
),
st0 AS (
  SELECT m, CAST(vec_id - {N_QUERIES} AS INT) AS k,
         {", ".join(f"x{i} AS s{i}" for i in range(1, sub + 1))},
         CAST(1 AS BIGINT) AS n
  FROM tr WHERE vec_id < {N_QUERIES + PQ_K}
)"""
    ]
    cgrid = ", ".join(
        f"CAST(floor(s{i} * {L}.0 / n) AS BIGINT) AS c{i}"
        for i in range(1, sub + 1)
    )
    ssum = ", ".join(
        f"CAST(SUM(x{i}) AS BIGINT) AS s{i}" for i in range(1, sub + 1)
    )
    scoal = ", ".join(
        f"COALESCE(g.s{i}, s.s{i}) AS s{i}" for i in range(1, sub + 1)
    )
    for t in range(PQ_TRAIN_ITERS):
        parts.append(
            f"""ct{t} AS (SELECT m, k, {cgrid} FROM st{t}),
a{t} AS (
  SELECT vec_id, m, {", ".join(f"x{i}" for i in range(1, sub + 1))}, k
  FROM (
    SELECT t.*, c.k,
           row_number() OVER (PARTITION BY t.vec_id, t.m
                              ORDER BY {d2("t", "c")}, c.k) AS rn
    FROM tr t JOIN ct{t} c ON t.m = c.m) z
  WHERE rn = 1
),
st{t + 1} AS (
  SELECT s.m, s.k, {scoal}, COALESCE(g.n, s.n) AS n
  FROM st{t} s LEFT JOIN (
    SELECT m, k, {ssum}, COUNT(*) AS n FROM a{t} GROUP BY m, k
  ) g ON s.m = g.m AND s.k = g.k
)"""
        )
    T = PQ_TRAIN_ITERS
    parts.append(
        f"""ctF AS (SELECT m, k, {cgrid} FROM st{T}),
codes AS (
  SELECT vec_id, m, k FROM (
    SELECT s.vec_id, s.m, c.k,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d2("s", "c")}, c.k) AS rn
    FROM subv s JOIN ctF c ON s.m = c.m) z
  WHERE rn = 1
),
pt AS (
  SELECT p.vec_id AS query_id, c.m, c.k, {d2("p", "c")} AS pd
  FROM subv p JOIN ctF c ON p.m = c.m
  WHERE p.vec_id < {N_QUERIES}
),
adc AS (
  SELECT pt.query_id, cd.vec_id AS neighbor_id,
         CAST(SUM(pt.pd) AS BIGINT) AS approx_dist
  FROM codes cd JOIN pt ON pt.m = cd.m AND pt.k = cd.k
  WHERE cd.vec_id <> pt.query_id
  GROUP BY pt.query_id, cd.vec_id
),
short AS (
  SELECT query_id, neighbor_id, approx_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_dist, neighbor_id) AS rn
    FROM adc) z
  WHERE rn <= {PQ_REFINE}
),
resc AS (
  SELECT s.query_id, s.neighbor_id, s.approx_dist,
         round(list_dot_product(q.emb, n.emb)
               / (sqrt(list_dot_product(q.emb, q.emb))
                  * sqrt(list_dot_product(n.emb, n.emb))), 6) AS cos_sim
  FROM short s
  JOIN v q ON q.vec_id = s.query_id
  JOIN v n ON n.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, approx_dist, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM resc) z
WHERE rank <= {TOP_K}"""
    )
    sql = ",\n".join(parts)
    # The training chain is a CTE diamond (st{t} feeds both ct{t} and
    # st{t+1}'s empty-cluster fallback). DuckDB 1.0 inlines CTEs, so
    # each extra reference doubles the subtree — 2^ITERS re-evaluation
    # (measured: 112s inlined vs 2.0s materialized at sf0.001). Pin
    # materialization explicitly; value-identical by definition.
    import re

    return re.sub(r"\bAS \(", "AS MATERIALIZED (", sql)


S09_ORACLE = _s09_oracle()


@query("s09_ann_pq", oracle=S09_ORACLE)
def s09_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC shortlist + exact re-rank (the FAISS IndexRefine
    pattern): codebooks + probes are driver-bounded collects
    (PQ_TRAIN_N + N_QUERIES rows, same class as s05/s06); the corpus
    never leaves the executors. Each Arrow batch lattice-quantizes
    its slice, encodes it (argmin over the codebook per subspace —
    exact int64 distances), and emits a per-batch local
    top-PQ_REFINE under the SAME total order (approx_dist asc, id
    asc) the shortlist window ranks by, so the local prune is
    lossless. The Q×PQ_REFINE shortlist (a broadcast-sized constant,
    never corpus-scaled) is then re-ranked by EXACT cosine via a
    broadcast join back to the true vectors — quantization error
    decides only which candidates enter the shortlist, not their
    final order. Recall@5 vs exact s01 ≈ 0.95+ with the refine stage
    (pinned in tests + the s10 gate)."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    ).localCheckpoint(eager=False)
    # Lazy within-run materialization (r17, the d04/d11 pattern): the
    # collect below materializes it; the kernel scan and the two
    # re-rank sides then read checkpointed rows instead of re-running
    # parquet decode + array conversion (4 passes total). Recomputed
    # from parquet every invocation.
    # ONE bounded collect for both driver-side row sets (r17, verdict
    # #6 — collect-per-round floors): the probe ids and the codebook
    # seed ids are adjacent ranges, so one scan job fetches both and
    # the split happens driver-side. Identical rows to the former two
    # filtered collects.
    head_rows = emb.filter(
        F.col("vec_id") < N_QUERIES + PQ_TRAIN_N
    ).collect()
    seed_rows = sorted(
        (r for r in head_rows if r["vec_id"] >= N_QUERIES),
        key=lambda r: r["vec_id"],
    )
    probe_rows = sorted(
        (r for r in head_rows if r["vec_id"] < N_QUERIES),
        key=lambda r: r["vec_id"],
    )
    # The oracle keys the initial codebook by vec_id − N_QUERIES;
    # this side takes the first PQ_K collected rows. Both are the
    # same rows only while the id space is dense here (s07's
    # dense-id contract) — fail loudly if the fixture drifts.
    got = [r["vec_id"] for r in seed_rows[:PQ_K]]
    if got != list(range(N_QUERIES, N_QUERIES + PQ_K)):  # survives -O
        raise ValueError(
            f"s09 codebook init requires dense vec_ids "
            f"{N_QUERIES}..{N_QUERIES + PQ_K - 1}; fixture has {got}"
        )
    sub = EMB_DIM // PQ_M
    lattice, ugrid = PQ_LATTICE, PQ_UGRID
    Utr = _pq_unit_lattice_np(
        np.array([r["emb"] for r in seed_rows], dtype=np.float64)
    ).reshape(-1, PQ_M, sub)
    C = _pq_train_np(Utr)  # (M, K, sub) int64 lattice codebook
    p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    Pu = _pq_unit_lattice_np(
        np.array([r["emb"] for r in probe_rows], dtype=np.float64)
    ).reshape(len(probe_rows), PQ_M, sub)
    # ADC tables: exact int64 squared lattice distance probe→codeword
    tables = ((Pu[:, :, None, :] * lattice - C[None]) ** 2).sum(-1)
    bc = spark.sparkContext.broadcast((p_ids, tables, C))
    refine = PQ_REFINE

    def kernel(batches):
        import numpy as _np
        import pandas as _pd

        ids_p, tabs, cbk = bc.value
        m, k, s = cbk.shape
        for pdf in batches:
            out = {"query_id": [], "neighbor_id": [], "approx_dist": []}
            if len(pdf):
                X = _np.stack(pdf["emb"].to_numpy()).astype(_np.float64)
                # unit-lattice quantization — inlined (kernels must be
                # closure-local), byte-for-byte _pq_unit_lattice_np
                sc_ = _np.abs(X).max(axis=1)
                sc_[sc_ == 0] = 1.0
                q8 = _np.rint(X / sc_[:, None] * 127)
                n8 = _np.sqrt((q8 * q8).sum(axis=1))
                n8[n8 == 0] = 1.0
                U = _np.rint(q8 / n8[:, None] * ugrid).astype(_np.int64)
                U = U.reshape(len(X), m, s)
                # encode: nearest codeword per subspace, exact int64
                d = ((U[:, :, None, :] * lattice - cbk[None]) ** 2).sum(-1)
                codes = d.argmin(-1)  # (n, M); first min ⇒ smallest k
                b_ids = pdf["vec_id"].to_numpy()
                mi = _np.arange(m)
                for i in range(len(ids_p)):
                    approx = tabs[i][mi[None, :], codes].sum(1)
                    cand = _np.nonzero(b_ids != ids_p[i])[0]
                    a = approx[cand]
                    order = _np.lexsort((b_ids[cand], a))[:refine]
                    for j in order:
                        out["query_id"].append(int(ids_p[i]))
                        out["neighbor_id"].append(int(b_ids[cand[j]]))
                        out["approx_dist"].append(int(a[j]))
            yield _pd.DataFrame(out)

    cand = emb.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, approx_dist long"
    )
    w_adc = W.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id")
    )
    shortlist = (
        cand.withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= refine)
        .drop("adc_rank")
    )
    # Exact re-rank of the bounded shortlist: broadcast the Q×R rows
    # against the corpus to fetch true vectors (one map-side join),
    # then score with exact cosine under s01's total order.
    probes = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    rescored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb")
        )
        .join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(probes), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_dist",
            F.round(cosine_d(F.col("qemb"), F.col("nemb")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_dist", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# S10 — PQ recall gate (driver-visible accuracy evidence for s09,
# the q47-q49 recipe applied to ANN): per probe, compute the EXACT
# top-k (s01's plan — DuckDB-verifiable) and s09's PQ answer, emit
# the exact neighbor count plus a boolean `recall ≥ floor`. The
# oracle recomputes the exact side and emits TRUE — so the driver's
# hash gates BOTH that the exact side matches across engines AND
# that the PQ index clears its pinned recall floor, upgrading s09's
# accuracy evidence from unit-test-only to every-round differential.
# Floor = 0.6/query (the unit-test minimum; measured 0.96-1.0 mean
# with the refine stage).
# ---------------------------------------------------------------------------

S10_RECALL_FLOOR = 0.6

S10_ORACLE = f"""
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       TRUE AS recall_ok
FROM ({S01_ORACLE}) t
GROUP BY query_id
"""


@query("s10_pq_recall_gate", oracle=S10_ORACLE)
def s10_pq_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = s01_knn_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    pq = s09_ann_pq(spark, sf_dir).select("query_id", "neighbor_id")
    n_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    n_hit = (
        exact.join(pq, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        n_exact.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            (
                F.coalesce(F.col("n_hit"), F.lit(0))
                >= F.lit(S10_RECALL_FLOOR) * F.col("n_exact")
            ).alias("recall_ok"),
        )
    )


# ---------------------------------------------------------------------------
# S11 — multi-vector late interaction (ColBERT-style MaxSim): each
# item is a BAG of sub-vectors; score(q, d) = Σ_i max_j cos(q_i, d_j)
# — every query sub-vector finds its best-matching doc sub-vector
# independently, which is the retrieval semantic single-vector cosine
# (s01) cannot express (one doc facet can dominate one query facet
# while another facet matches elsewhere). The fixture carries one
# 64-d vector per item, so the sub-vector bag is a deterministic
# 4×16-d slicing — the MECHANISM under test is the max-reduce inner
# loop and its ranking, not the encoder. All 16 pairwise cosines are
# codegen column expressions; the plan is s01's broadcast shape with
# a wider scoring expression — no extra shuffle, no Python.
#
# Scale: MaxSim cost is |Q|·|C|·(m_q·m_d) dot products — the
# production path prunes |C| first with a single-vector ANN stage
# (s02/s05/s09) and MaxSim-rescores the shortlist, exactly the
# refine pattern s09 pins; this operator IS that rescorer.
#
# Determinism: per-term cosines are identical IEEE trees in both
# engines; the SUM is a fixed 4-term left-to-right add; ranking by
# ROUND(score, 6) with id tie-break per the repo contract.
# ---------------------------------------------------------------------------

MAXSIM_PARTS = 4
_SUB = EMB_DIM // MAXSIM_PARTS


def _maxsim_sql() -> str:
    def cos(a, b):
        return (
            f"(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))))"
        )

    terms = []
    for i in range(MAXSIM_PARTS):
        qi = f"list_slice(q.qemb, {i * _SUB + 1}, {(i + 1) * _SUB})"
        best = ", ".join(
            cos(qi, f"list_slice(c.emb, {j * _SUB + 1}, {(j + 1) * _SUB})")
            for j in range(MAXSIM_PARTS)
        )
        terms.append(f"greatest({best})")
    return " + ".join(terms)


S11_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_maxsim_sql()}, 6) AS maxsim
  FROM q, v c
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, maxsim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY maxsim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


@query("s11_maxsim_late_interaction", oracle=S11_ORACLE)
def s11_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )

    def sub(col, i):
        return F.slice(col, i * _SUB + 1, _SUB)

    terms = []
    for i in range(MAXSIM_PARTS):
        qi = sub(F.col("qemb"), i)
        terms.append(
            F.greatest(
                *[
                    cosine_d(qi, sub(F.col("emb"), j))
                    for j in range(MAXSIM_PARTS)
                ]
            )
        )
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(score, 6).alias("maxsim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "maxsim", "rank")
    )


# ---------------------------------------------------------------------------
# S12 — hybrid retrieval with reciprocal-rank fusion (r6): BM25
# lexical top-K and cosine vector top-K, fused by RRF
# (Cormack et al. 2009: score = Σ 1/(60 + rank)) — the production
# retrieval stack (every RAG/search pipeline runs exactly this
# keyword+vector fusion; neither list alone survives contact with
# real queries). Queries are the first N_QUERIES documents (their
# text drives BM25, their aligned embedding drives the vector side —
# the m06 doc_id==vec_id convention).
#
# BM25 (k1=1.2, b=0.75, Lucene idf ln((N−df+.5)/(df+.5)+1)): the
# per-(query,doc) score sums per-term contributions — a float sum,
# so it accumulates in exact DECIMAL(38,18) (the g01 recipe; each
# per-term contribution is itself a deterministic function of
# integer tf/df/len and the exact-rational avgdl). Ranks order by
# (round(score, 6) DESC, doc_id); fusion adds two exact rationals
# 1/(60+r) in a fixed order; final top-10 orders by
# (round(rrf, 9) DESC, doc_id). Every boundary is rounded-then-
# tie-broken, so both engines retrieve identical lists.
#
# Scale shape: BM25 is the inverted-index join — the tiny exploded
# query-term side BROADCASTS onto the corpus posting lists (one
# shuffle to build tf, none to probe); the vector side is s01's
# broadcast-probe scan; fusion full-outer-joins two top-K lists of
# N_QUERIES×K rows (driver-scale tiny, but kept distributed). At
# 100 TB the posting-list join IS the scalable formulation — the
# per-term fan-out is bounded by document frequency, and RRF needs
# only each side's top-K, never full scores.
# ---------------------------------------------------------------------------

S12_K_EACH = 50   # depth of each retrieved list entering fusion
S12_TOP = 10      # fused results per query
S12_RRF_K = 60    # standard RRF damping constant
S12_K1, S12_B = 1.2, 0.75

S12_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t
), dl AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
), df AS (
  SELECT t, count(*) AS df FROM tf GROUP BY t
), stats AS (
  SELECT count(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
), q AS (
  SELECT doc_id AS query_id, t
  FROM (SELECT DISTINCT doc_id, t FROM tok WHERE doc_id < {N_QUERIES})
), contrib AS (
  SELECT q.query_id, tf.doc_id,
         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
         * tf.tf * ({S12_K1} + 1)
         / (tf.tf + {S12_K1} * (1 - {S12_B} + {S12_B} * dl.dl / stats.avgdl))
           AS c
  FROM q
  JOIN tf ON q.t = tf.t
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON q.t = df.t
  CROSS JOIN stats
  WHERE tf.doc_id <> q.query_id
), lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(CAST(SUM(CAST(c AS DECIMAL(38,18))) AS DOUBLE), 6)
                    DESC, doc_id) AS lex_rank
  FROM contrib GROUP BY query_id, doc_id
  QUALIFY lex_rank <= {S12_K_EACH}
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), vec AS (
  SELECT query_id, doc_id, vec_rank FROM (
    SELECT qv.vec_id AS query_id, v.vec_id AS doc_id,
           row_number() OVER (
             PARTITION BY qv.vec_id
             ORDER BY round(list_dot_product(qv.emb, v.emb)
                            / (sqrt(list_dot_product(qv.emb, qv.emb))
                               * sqrt(list_dot_product(v.emb, v.emb))), 6)
                      DESC, v.vec_id) AS vec_rank
    FROM (SELECT * FROM v WHERE vec_id < {N_QUERIES}) qv
    JOIN v ON v.vec_id <> qv.vec_id
  ) WHERE vec_rank <= {S12_K_EACH}
), fused AS (
  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
         COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         lex.lex_rank, vec.vec_rank,
         round(COALESCE(1.0 / ({S12_RRF_K} + lex.lex_rank), 0)
               + COALESCE(1.0 / ({S12_RRF_K} + vec.vec_rank), 0), 9) AS rrf
  FROM lex FULL OUTER JOIN vec
    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id
)
SELECT query_id, doc_id, lex_rank, vec_rank, rrf FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {S12_TOP}
"""


@query("s12_rrf_hybrid_search", oracle=S12_ORACLE)
def s12_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import dsum

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    q = (
        tok.filter(F.col("doc_id") < N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "t")
        .distinct()
    )
    # query terms + idf + scalars all fold into the SMALL broadcast
    # side; the corpus-side tf table crosses ONE BroadcastHashJoin
    qterms = (
        q.join(df_t, "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "t",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1
            ).alias("idf"),
            "avgdl",
        )
    )
    contrib = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(qterms), "t")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (S12_K1 + 1)
                / (
                    F.col("tf")
                    + S12_K1
                    * (1 - S12_B + S12_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    wl = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    lex = (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.round(dsum("c", 38, 18), 6).alias("score"))
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= S12_K_EACH)
        .select("query_id", "doc_id", "lex_rank")
    )
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    probes = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    vec = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("cos"),
        )
        .withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= S12_K_EACH)
        .select("query_id", "doc_id", "vec_rank")
    )
    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "vec_rank",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (S12_RRF_K + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (S12_RRF_K + F.col("vec_rank")), F.lit(0.0)
                ),
                9,
            ).alias("rrf"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= S12_TOP)
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf")
    )


# ---------------------------------------------------------------------------
# S13 — MMR diversified re-ranking (Maximal Marginal Relevance,
# Carbonell & Goldstein 1998): the production RAG/search step BETWEEN
# retrieval and the context window — from each query's top-M cosine
# shortlist, greedily select K items maximizing
#   0.7·rel(d) − 0.3·max_{s∈Selected} sim(d, s)
# so the context is relevant AND non-redundant (a shortlist of
# near-duplicates wastes the whole window; s01's pure top-k happily
# returns one).
#
# Execution (zero Python): the greedy is K unrolled steps of
# higher-order ARRAY expressions over the per-query candidate array —
# each step scores the remaining candidates with transform()
# (pairwise cosines via zip_with/aggregate folds), picks the argmax
# with array_sort under an explicit (mmr DESC, id) comparator, and
# shrinks the remainder with filter(). All JVM codegen; per-query
# work is O(K·M·dim), data volume after the shortlist is
# O(queries·M·dim) — the iterative selection never touches the
# corpus again.
#
# Determinism/differential recipe: rel and every pairwise sim are
# rounded to 6dp FIRST (the s01 contract — absorbs fold-order ulp),
# the 0.7/0.3 combination is then plain IEEE double arithmetic on
# identical inputs, ties break on id, and step 1's empty-selection
# max-sim coalesces to 0.0 (pure relevance) on both engines. The
# oracle unrolls the same K greedy iterations as MATERIALIZED CTEs
# (pick_i = per-query argmax via row_number, sel_i = union of picks;
# MATERIALIZED per the DuckDB diamond-CTE rule) — a differential-
# checked ITERATIVE op in the g01/s07 tradition. The OUTPUT score is
# rounded at 7dp, not 6: mmr = 0.7·rel − 0.3·maxsim over two 6dp
# inputs lies (in exact arithmetic) ON a 7dp grid point, so a 6dp
# round sits exactly on the half boundary whenever rel's 6th digit
# is odd — where Spark (HALF_UP) and DuckDB (nearbyint, half-even)
# disagree (hit once at sf0.01: 0.2600395 → 0.26004 vs 0.260039).
# At 7dp the computed double is within a few ulp of the grid point
# and ~1e9 ulp away from any boundary — both engines snap identically.
# ---------------------------------------------------------------------------

MMR_M = 10        # cosine shortlist depth per query
MMR_K = 5         # diversified picks per query
MMR_LAMBDA = 0.7  # relevance weight; 1-λ weights redundancy


def _mmr_oracle(nq: int, m: int, k: int) -> str:
    lam, one_m = MMR_LAMBDA, round(1.0 - MMR_LAMBDA, 6)
    sql = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM v WHERE vec_id < {nq}),
sc AS (
  SELECT q.query_id, v.vec_id AS id,
         round(list_dot_product(q.qemb, v.emb)
               / (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 6) AS rel,
         v.emb AS emb
  FROM q, v WHERE v.vec_id <> q.query_id
),
cand AS MATERIALIZED (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                              ORDER BY rel DESC, id) AS rk
                 FROM sc)
  WHERE rk <= {m}
)"""
    prev_sel = None
    steps = []
    for i in range(1, k + 1):
        if prev_sel is None:
            mmr = f"{lam}*c.rel - {one_m}*0.0"
            notin = ""
        else:
            mmr = (
                f"{lam}*c.rel - {one_m}*("
                "SELECT max(round(list_dot_product(c.emb, s.emb)"
                "/(sqrt(list_dot_product(c.emb, c.emb))"
                f"*sqrt(list_dot_product(s.emb, s.emb))),6)) "
                f"FROM {prev_sel} s WHERE s.query_id = c.query_id)"
            )
            notin = (
                f" AND NOT EXISTS (SELECT 1 FROM {prev_sel} s2 "
                "WHERE s2.query_id = c.query_id AND s2.id = c.id)"
            )
        union = " UNION ALL ".join(
            f"SELECT query_id, id, rel, emb, position, mmr FROM pick{j}"
            for j in range(1, i + 1)
        )
        steps.append(f"""
pick{i} AS MATERIALIZED (
  SELECT query_id, id, rel, emb, {i} AS position, mmr FROM (
    SELECT c.*, {mmr} AS mmr,
           row_number() OVER (PARTITION BY c.query_id
                              ORDER BY {mmr} DESC, c.id) AS prn
    FROM cand c WHERE TRUE{notin}
  ) WHERE prn = 1
),
sel{i} AS MATERIALIZED ({union})""")
        prev_sel = f"sel{i}"
    sql += "," + ",".join(steps)
    sql += (
        f"\nSELECT query_id, position, id AS neighbor_id, rel, "
        f"round(mmr, 7) AS mmr_score FROM sel{k}\n"
    )
    return sql


S13_ORACLE = _mmr_oracle(N_QUERIES, MMR_M, MMR_K)


@query("s13_mmr_diversified", oracle=S13_ORACLE)
def s13_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 — MMR diversified re-ranking over the per-query cosine
    shortlist: K greedy argmax steps unrolled as JVM higher-order
    array expressions (transform/array_sort/filter), zero Python;
    oracle unrolls the identical greedy as MATERIALIZED CTEs."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_d(F.col("qemb"), F.col("emb")), 6).alias("rel"),
            "emb",
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    cands = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MMR_M)
        .groupBy("query_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("neighbor_id").alias("id"),
                    F.col("rel").alias("rel"),
                    F.col("emb").alias("emb"),
                )
            ).alias("rem")
        )
    )
    # collect_list order is partition-dependent, but every step below
    # is an argmax under a TOTAL order (mmr DESC, id) — the result is
    # array-order-independent by construction.

    def pairsim(r, s):
        return F.round(
            dot_d(r["emb"], s["emb"])
            / (l2norm_d(r["emb"]) * l2norm_d(s["emb"])),
            6,
        )

    def mmr_of(r, sel):
        maxsim = F.coalesce(
            F.array_max(F.transform(sel, lambda s: pairsim(r, s))),
            F.lit(0.0),
        )
        return (
            F.lit(MMR_LAMBDA) * r["rel"]
            - F.lit(round(1.0 - MMR_LAMBDA, 6)) * maxsim
        )

    def by_mmr_then_id(a, b):
        # NULL mmr (a zero-norm vector — cosine_d's documented
        # degenerate case) ranks LAST, matching the oracle's
        # row_number(ORDER BY mmr DESC, id) under DuckDB's
        # NULLs-last default. Without the explicit NULL branches
        # both mmr comparisons evaluate NULL→false and the
        # comparator falls through to the id tie-break — promoting
        # a NULL candidate by low id and making the comparator
        # non-transitive (r10 review).
        ids = (
            F.when(a["id"] < b["id"], F.lit(-1))
            .when(a["id"] > b["id"], F.lit(1))
            .otherwise(F.lit(0))
        )
        return (
            F.when(a["mmr"].isNull() & b["mmr"].isNull(), ids)
            .when(a["mmr"].isNull(), F.lit(1))
            .when(b["mmr"].isNull(), F.lit(-1))
            .when(a["mmr"] > b["mmr"], F.lit(-1))
            .when(a["mmr"] < b["mmr"], F.lit(1))
            .otherwise(ids)
        )

    df = cands.withColumn(
        "sel",
        F.expr("array()").cast(
            "array<struct<id:bigint,mmr:double,rel:double,"
            "emb:array<double>>>"
        ),
    )
    for _step in range(MMR_K):
        scored_rem = F.transform(
            F.col("rem"),
            lambda r: F.struct(
                r["id"].alias("id"),
                mmr_of(r, F.col("sel")).alias("mmr"),
                r["rel"].alias("rel"),
                r["emb"].alias("emb"),
            ),
        )
        best = F.element_at(F.array_sort(scored_rem, by_mmr_then_id), 1)
        df = (
            df.withColumn("best", best)
            .withColumn("sel", F.concat("sel", F.array("best")))
            .withColumn(
                "rem",
                F.filter(
                    F.col("rem"),
                    lambda r: r["id"] != F.col("best")["id"],
                ),
            )
            .drop("best")
        )
        # Plan-size barrier (r11): without it, CollapseProject inlines
        # each step's sel/rem into the next step's expressions — best
        # references rem once via the sort and sel once via concat,
        # rem references best again — so the analyzed tree grows
        # ~4-5× PER STEP and Catalyst analysis + codegen of the K=5
        # unrolled plan cost a flat ~14s regardless of data size
        # (measured at sf0.001; the rehearsal's α=0.06 with a 15s
        # intercept was exactly this). localCheckpoint truncates the
        # logical plan between steps (the d06/g01 iterative-loop
        # pattern, graph.py) — values are untouched, per-step
        # analysis is now constant-size, and the whole op drops to
        # ~2s. Data volume at the barrier is the post-shortlist
        # O(queries·M·dim) — the corpus never reaches this loop.
        if _step < MMR_K - 1:
            df = df.localCheckpoint(eager=False)
    return (
        df.select("query_id", F.posexplode("sel").alias("pos0", "s"))
        .select(
            "query_id",
            (F.col("pos0") + 1).alias("position"),
            F.col("s.id").alias("neighbor_id"),
            F.col("s.rel").alias("rel"),
            F.round(F.col("s.mmr"), 7).alias("mmr_score"),
        )
    )
