"""Similarity search over the `embeddings` table (brief: ANN as a
first-class training-data op).

Baseline: brute-force cosine top-k with the query side broadcast (the
100 TB-scale shape: tiny query set × huge corpus, corpus never shuffled).
Scale path: bucketed ("IVF-style") variant — here the coarse quantizer is
the `label` column standing in for a k-means cell id, so only the query's
own cell is scanned.

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
    """IVF-style: scan only the query's own coarse cell (label)."""
    e = T(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    pairs = e.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = pairs.withColumn("cos_sim", F.expr(_cos_expr("q_emb", "embedding")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("vec_id").alias("nn_id"), "cos_sim")
    )


SQL_ANN_BUCKET = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
           FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.q_id, e.vec_id,
         {_cos_duck('q.q_emb', 'e.embedding')} AS cos_sim
  FROM embeddings e JOIN q ON e.label = q.q_label AND e.vec_id <> q.q_id)
SELECT q_id, vec_id AS nn_id, cos_sim FROM (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored) t
WHERE rn = 1
"""


SIMILARITY = {
    "embedding_cosine_topk": (q_cosine_topk, SQL_TOPK_COS),
    "ann_ivf_bucketed": (q_ann_bucketed, SQL_ANN_BUCKET),
}
