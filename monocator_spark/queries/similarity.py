"""Similarity search over the `embeddings` table (brief: ANN as a
first-class training-data op).

Baseline: brute-force cosine top-k with the query side broadcast (the
100 TB-scale shape: tiny query set × huge corpus, corpus never shuffled).
Scale paths (the brief names both): IVF — deterministic seeded centroids,
nearest-centroid assignment (broadcast k centroids × corpus, linear),
then probe only the query's own cell — and signed-random-projection LSH —
bucket = sign pattern of NBITS fixed hyperplane projections, probe only
the query's bucket. Composite: MinHash-LSH candidates confirmed by
embedding cosine (two-stage semantic dedup).

Cross-engine float parity: both engines fold the dot product sequentially
over doubles (Spark `aggregate` HOF; DuckDB `list_dot_product` on a
double-cast list), so values are bit-identical before the defensive
round(…, 4). Ranking always orders by the *rounded* value with vec_id as
tiebreak so a last-ulp difference can never reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from monocator_spark.queries.relational import T

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)


def _cos_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), 4)"


_DOT_DUCK = "list_dot_product(list_transform({a}, x -> CAST(x AS DOUBLE)), list_transform({b}, x -> CAST(x AS DOUBLE)))"


def _cos_duck(a: str, b: str) -> str:
    dot = _DOT_DUCK.format(a=a, b=b)
    na = _DOT_DUCK.format(a=a, b=a)
    nb = _DOT_DUCK.format(a=b, b=b)
    return f"ROUND({dot} / (sqrt({na}) * sqrt({nb})), 4)"


def q_cosine_topk(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = e.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("q_id"))
    scored = pairs.withColumn("cos_sim", F.expr(_cos_expr("q_emb", "embedding")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("q_id", "vec_id", "cos_sim", "rn")
    )


SQL_TOPK_COS = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_cos_duck('q.q_emb', 'e.embedding')} AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id, cos_sim, rn FROM (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) t
WHERE rn <= 3
"""


def q_ann_bucketed(spark, sf_dir):
    """IVF with a real coarse quantizer — no pre-existing label column.

    Train: deterministic seeded centroids (every 64th vector, ids ≡ 3 mod
    64 — the "k-means seed" step; on an unlabeled corpus this is exactly
    how IVF bootstraps). Assign: every vector goes to its nearest centroid
    by (rounded) cosine, centroid-id tiebreak — a broadcast of k centroids
    against the corpus, linear in |corpus|·k, never an all-pairs join.
    Probe: each query scans only its own cell. The bucketed join is the
    100 TB shape: cells partition the corpus, the query side is broadcast.
    """
    e = T(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") % 64 == 3).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )

    def _assign(vecs):
        scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
            "cs", F.expr(_cos_expr("embedding", "c_emb"))
        )
        wc = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
        return (
            scored.withColumn("rn", F.row_number().over(wc))
            .where(F.col("rn") == 1)
            .select("vec_id", "embedding", F.col("cent_id").alias("cell"))
        )

    assigned = _assign(e)
    # the query side re-assigns ONLY its own 20 vectors (assignment is a
    # pure function of the vector) — deriving q from `assigned` would make
    # Spark recompute the full corpus x centroids pass a second time
    q = _assign(e.where(F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
    )
    pairs = assigned.join(
        F.broadcast(q),
        (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")),
    )
    probed = pairs.withColumn("cos_sim", F.expr(_cos_expr("q_emb", "embedding")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        probed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("q_cell").alias("cell"),
                F.col("vec_id").alias("nn_id"), "cos_sim")
    )


SQL_ANN_BUCKET = f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS c_emb
  FROM embeddings WHERE vec_id % 64 = 3),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_cos_duck('e.embedding', 'c.c_emb')} DESC, c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents c) t
  WHERE rn = 1),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, cell AS q_cell
      FROM assigned WHERE vec_id < 20),
probed AS (
  SELECT q.q_id, q.q_cell, a.vec_id,
         {_cos_duck('q.q_emb', 'a.embedding')} AS cos_sim
  FROM assigned a JOIN q ON a.cell = q.q_cell AND a.vec_id <> q.q_id)
SELECT q_id, q_cell AS cell, vec_id AS nn_id, cos_sim FROM (
  SELECT q_id, q_cell, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM probed) t
WHERE rn = 1
"""


# -- LSH-bucketed ANN (signed random projection) ---------------------------------------------
# The brief's other scale path next to IVF: bucket = the sign pattern of
# NBITS fixed hyperplane projections. Hyperplane components are ±1, derived
# once from md5 (the repo's shared cross-engine hash) at plan-build time and
# embedded as LITERAL arrays in both engines' plans — per-row cost is NBITS
# fused zip_with/aggregate folds, no hashing in the hot path. Probe touches
# only the query's bucket: corpus partitioned by bucket, query side
# broadcast — the same 100 TB shape as the IVF cell probe. Like any LSH
# index the recall is approximate BY DESIGN; the oracle mirrors the
# algorithm (same buckets, same probe), so the comparison pins the
# implementation, not brute-force recall.
_LSH_NBITS = 6  # 64 buckets
_LSH_DIM = 64  # testdata embedding dim (a config knob at scale)


def _lsh_signs(bit: int) -> list[float]:
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"hp|{bit}|{i}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1.0
        for i in range(_LSH_DIM)
    ]


def _lsh_bucket_spark() -> str:
    bits = []
    for b in range(_LSH_NBITS):
        arr = ", ".join(f"cast({s} as double)" for s in _lsh_signs(b))
        proj = (
            f"aggregate(zip_with(embedding, array({arr}),"
            " (x, s) -> cast(x as double) * s),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"if({proj} > 0d, shiftleft(cast(1 as bigint), {b}), cast(0 as bigint))")
    return " + ".join(bits)


def _lsh_bucket_duck() -> str:
    bits = []
    for b in range(_LSH_NBITS):
        arr = ", ".join(str(s) for s in _lsh_signs(b))
        proj = (
            "list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),"
            f" [{arr}])"
        )
        bits.append(
            f"CASE WHEN {proj} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(bits)


def q_ann_lsh_bucketed(spark, sf_dir):
    """ANN via signed-random-projection LSH buckets: assign every vector a
    ``bucket`` (one linear scan, NBITS constant-array folds per row), then
    each query's top-1 neighbor comes from ITS bucket only."""
    e = T(spark, sf_dir, "embeddings")
    assigned = e.select(
        "vec_id", "embedding", F.expr(_lsh_bucket_spark()).alias("bucket")
    )
    q = assigned.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = assigned.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    probed = pairs.withColumn("cos_sim", F.expr(_cos_expr("q_emb", "embedding")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        probed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("q_bucket").alias("bucket"),
                F.col("vec_id").alias("nn_id"), "cos_sim")
    )


def _sql_ann_lsh() -> str:
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding, {_lsh_bucket_duck()} AS bucket FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
      FROM assigned WHERE vec_id < 20),
probed AS (
  SELECT q.q_id, q.q_bucket, a.vec_id,
         {_cos_duck('q.q_emb', 'a.embedding')} AS cos_sim
  FROM assigned a JOIN q ON a.bucket = q.q_bucket AND a.vec_id <> q.q_id)
SELECT q_id, q_bucket AS bucket, vec_id AS nn_id, cos_sim FROM (
  SELECT q_id, q_bucket, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM probed) t
WHERE rn = 1
"""


def q_semantic_dedup(spark, sf_dir):
    """Two-stage semantic dedup — the standard LLM-pipeline composite:
    stage 1 = MinHash-LSH candidate pairs (cheap, lexical, near-linear);
    stage 2 = embedding-cosine confirmation of ONLY those candidates (the
    expensive signal touches O(candidates), never O(n²) pairs). Join keys:
    doc_id ≡ vec_id in the testdata."""
    from monocator_spark.queries.textops import q_minhash_lsh_pairs

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    e = T(spark, sf_dir, "embeddings")
    e1 = e.select(F.col("vec_id").alias("doc1"), F.col("embedding").alias("emb1"))
    e2 = e.select(F.col("vec_id").alias("doc2"), F.col("embedding").alias("emb2"))
    return (
        pairs.join(e1, "doc1")
        .join(e2, "doc2")
        .withColumn("cos_sim", F.expr(_cos_expr("emb1", "emb2")))
        .withColumn("confirmed", F.col("cos_sim") >= 0.1)
        .select("doc1", "doc2", "cos_sim", "confirmed")
    )


def _sql_semantic_dedup() -> str:
    from monocator_spark.queries.textops import SQL_LSH

    cos = _cos_duck("ea.embedding", "eb.embedding")
    return f"""
SELECT p.doc1, p.doc2, {cos} AS cos_sim, {cos} >= 0.1 AS confirmed
FROM ({SQL_LSH}) p
JOIN embeddings ea ON ea.vec_id = p.doc1
JOIN embeddings eb ON eb.vec_id = p.doc2
"""


SIMILARITY = {
    "embedding_cosine_topk": (q_cosine_topk, SQL_TOPK_COS),
    "ann_ivf_bucketed": (q_ann_bucketed, SQL_ANN_BUCKET),
    "ann_lsh_bucketed": (q_ann_lsh_bucketed, _sql_ann_lsh()),
    "semantic_dedup_twostage": (q_semantic_dedup, _sql_semantic_dedup()),
}
