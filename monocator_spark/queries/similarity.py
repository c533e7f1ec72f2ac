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


# -- exact embedding near-dup via metric grid blocking -------------------------
# The EXACT counterpart to the LSH paths: for unit vectors, cos(x,y) ≥ τ
# implies ||x̂−ŷ||₂ ≤ √(2−2τ), hence per-coordinate |x̂ᵢ−ŷᵢ| ≤ w = √(2−2τ).
# Bucketing the first m normalized coordinates into w-wide grid cells and
# joining each cell against its 3^m neighbors is therefore a SUPERSET of
# the true pair set — candidate generation with zero recall loss, unlike
# random-hyperplane LSH. Pruning factor ≈ (spread/w)^m, so it has power
# exactly in the near-dup regime (high τ → small w); at 100 TB the grid
# cell is the shuffle key and each cell joins only its neighborhood —
# no all-pairs stage anywhere. The real embeddings table has no
# near-dup structure (max pairwise cosine 0.51), so — the same move the
# phash family makes for absent image bytes — the vectors are synthesized
# deterministically on BOTH engines from vec_id with planted clusters:
# 50 md5-derived 16-dim cluster centroids, ±0.05-scale md5 per-vector
# noise, so intra-cluster cosine ≈ 0.9975 and inter-cluster cosine is
# sub-0.9. Values: integer-md5 / 1000.0 arithmetic → bit-identical doubles
# on both engines; the defensive round(…, 4) on the cosine matches the
# rest of this module.
_ND_CLUSTERS = 50
_ND_DIM = 16
_ND_TAU = 0.99
# blocking width from τ' = 0.985 < the rounded-filter's effective floor
# (round(c,4) ≥ 0.99 ⟸ c ≥ 0.98995), keeping the grid a strict superset
_ND_W = (2 - 2 * 0.985) ** 0.5

_H15_SPARK = (
    "(cast(conv(substr(md5(concat('{tag}|', cast({key} as string), '|',"
    " cast(k as string))),1,15),16,10) as bigint) % 2001 - 1000)"
)
_H15_DUCK = (
    "(CAST(('0x'||substr(md5('{tag}|'||CAST({key} AS VARCHAR)||'|'"
    "||CAST(k AS VARCHAR)),1,15)) AS BIGINT) % 2001 - 1000)"
)
_VEC_SPARK = (
    f"transform(sequence(0, {_ND_DIM - 1}), k -> "
    f"cast({_H15_SPARK.format(tag='emb', key=f'vec_id % {_ND_CLUSTERS}')} as double) / 1000.0"
    f" + cast({_H15_SPARK.format(tag='nz', key='vec_id')} as double) / 20000.0)"
)
_VEC_DUCK = (
    f"list_transform(range(0, {_ND_DIM}), k -> "
    f"{_H15_DUCK.format(tag='emb', key=f'vec_id % {_ND_CLUSTERS}')} / 1000.0"
    f" + {_H15_DUCK.format(tag='nz', key='vec_id')} / 20000.0)"
)


def q_embedding_neardup_pairs(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_VEC_SPARK).alias("emb")
    )
    nrm = F.expr(_DOT.format(a="emb", b="emb"))
    # n2 (self dot product) is computed once per point, not per pair: the
    # fold yields the same double either way, so cos stays bit-identical to
    # the oracle while the verify stage folds only the cross dot product
    pts = e.select(
        "vec_id",
        "emb",
        nrm.alias("n2"),
        F.floor(F.col("emb")[0] / F.sqrt(nrm) / F.lit(_ND_W)).alias("b0"),
        F.floor(F.col("emb")[1] / F.sqrt(nrm) / F.lit(_ND_W)).alias("b1"),
    )
    # side B re-keys each point under its 9 neighbor cells; a qualifying
    # pair lands on exactly one (cell, cell) key — no post-join distinct
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probe = (
        pts.select(
            F.col("vec_id").alias("vb"),
            F.col("emb").alias("eb"),
            F.col("n2").alias("nb2"),
            "b0",
            "b1",
            F.explode(offs).alias("d0"),
        )
        .select("vb", "eb", "nb2", (F.col("b0") + F.col("d0")).alias("nb0"),
                "b1", F.explode(offs).alias("d1"))
        .select("vb", "eb", "nb2", "nb0",
                (F.col("b1") + F.col("d1")).alias("nb1"))
    )
    cand = pts.join(
        probe,
        (F.col("b0") == F.col("nb0"))
        & (F.col("b1") == F.col("nb1"))
        & (F.col("vec_id") < F.col("vb")),
    )
    dot = _DOT.format(a="emb", b="eb")
    return (
        cand.withColumn(
            "cos_sim", F.expr(f"round({dot} / (sqrt(n2) * sqrt(nb2)), 4)")
        )
        .where(F.col("cos_sim") >= _ND_TAU)
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            "cos_sim",
        )
    )


def _sql_neardup() -> str:
    cos = _cos_duck("a.emb", "b.emb")
    return f"""
WITH v AS (
  SELECT vec_id, {_VEC_DUCK} AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {cos} >= {_ND_TAU}
"""


# -- distributed k-means (one full Lloyd iteration) ------------------------------
# Embedding-space clustering is the backbone of semantic curation (SemDeDup
# clusters, then prunes within each cell; cluster-balanced sampling needs the
# same assignment). One full Lloyd iteration, end to end: seed → assign →
# recompute centroids → reassign, reporting which vectors changed cells.
#
# Cross-engine exactness: floats never accumulate. Coordinates are quantized
# once to integers (floor(x·1000) — floor of an identically-computed double
# is deterministic), distances are exact integer sums of squares, and the
# updated centroid is floor(sum/count) per dimension — the one double
# division both engines compute identically from exact-integer operands.
# (Exact while per-cell coordinate sums stay under 2^53 — at 10^10 rows use
# avg() and accept last-ulp risk, or widen to decimal.)
#
# Shape at 100 TB: the classic distributed k-means step — k centroids
# broadcast against a linear corpus scan (assignment), per-(cell, dim)
# partial-aggregated sums that shrink to k×dim rows before the driver-free
# array re-assembly (sort_array ∘ collect_list, the same idiom as the TLS
# map column), then a second broadcast assignment. The corpus shuffles only
# as (cell, dim, value) triples — never full vectors, never all-pairs.
_KM_Q = 1000  # fixed-point scale


def _quant_spark(col: str) -> str:
    return (
        f"transform({col}, x -> cast(floor(cast(x as double) * {_KM_Q})"
        " as bigint))"
    )


def _quant_duck(col: str) -> str:
    return (
        f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {_KM_Q})"
        " AS BIGINT))"
    )


_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)


def q_kmeans_iter_assign(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_quant_spark("embedding")).alias("qe")
    )
    cents0 = e.where(F.col("vec_id") % 64 == 3).select(
        F.col("vec_id").alias("cent_id"), F.col("qe").alias("ce")
    )

    def _assign(cents, out):
        scored = e.crossJoin(F.broadcast(cents)).withColumn(
            "d", F.expr(_SQDIST.format(a="qe", b="ce"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cent_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "qe", F.col("cent_id").alias(out),
                    F.col("d").alias(f"d_{out}"))
        )

    a0 = _assign(cents0, "cell0")
    sums = (
        a0.select("cell0", F.posexplode("qe").alias("dim", "v"))
        .groupBy("cell0", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cents1 = (
        sums.withColumn(
            "cv",
            F.floor(F.col("s") / F.col("n").cast("double")).cast("bigint"),
        )
        .groupBy("cell0")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(dim, cv))),"
                " p -> p.cv)"
            ).alias("ce")
        )
        .select(F.col("cell0").alias("cent_id"), "ce")
    )
    a1 = _assign(cents1, "cell1").select("vec_id", "cell1", "d_cell1")
    return (
        a0.select("vec_id", "cell0")
        .join(a1, "vec_id")
        .select(
            "vec_id",
            "cell0",
            "cell1",
            (F.col("cell0") != F.col("cell1")).alias("moved"),
            F.col("d_cell1").alias("d1"),
        )
    )


def _sql_kmeans() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, {_quant_duck('embedding')} AS qe FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cent_id, qe AS ce FROM e WHERE vec_id % 64 = 3
),
a0 AS (
  SELECT vec_id, qe, cent_id AS cell0 FROM (
    SELECT e.vec_id, e.qe, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, len(e.qe) + 1),
               i -> (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)])
                    * (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)]))),
             c.cent_id) AS rn
    FROM e CROSS JOIN cents0 c) t
  WHERE rn = 1
),
sums AS (
  SELECT cell0, i AS dim, SUM(qe[CAST(i AS INT)]) AS s, COUNT(*) AS n
  FROM a0, range(1, 65) r(i)
  GROUP BY cell0, i
),
cents1 AS (
  SELECT cell0 AS cent_id,
         list(CAST(floor(s / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS ce
  FROM sums GROUP BY cell0
),
a1 AS (
  SELECT vec_id, cent_id AS cell1, d AS d1 FROM (
    SELECT e.vec_id, c.cent_id,
           list_sum(list_transform(range(1, len(e.qe) + 1),
             i -> (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)])
                  * (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)]))) AS d,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, len(e.qe) + 1),
               i -> (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)])
                    * (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)]))),
             c.cent_id) AS rn
    FROM e CROSS JOIN cents1 c) t
  WHERE rn = 1
)
SELECT a0.vec_id, a0.cell0, a1.cell1,
       (a0.cell0 <> a1.cell1) AS moved,
       CAST(a1.d1 AS BIGINT) AS d1
FROM a0 JOIN a1 ON a0.vec_id = a1.vec_id
"""


# -- Cluster-balanced sampling ----------------------------------------------------
# The downsampling rule that PRESERVES DIVERSITY: after clustering the
# corpus in embedding space, cap every cluster at K vectors instead of
# sampling uniformly (uniform sampling reproduces the corpus's mode
# collapse; per-cluster caps flatten it — the balanced-sampling step that
# typically follows k-means in embedding-space curation, same family as
# SemDeDup's cluster stage). Assignment reuses the kmeans op's exact
# integer machinery (floor(x·1000) quantization, integer squared
# distances, cent_id tiebreak); within a cell the kept K are chosen by
# (md5(vec_id), vec_id) — a deterministic, seed-free pseudo-random order
# any engine reproduces, exactly like domain_cap_sample's pick.
#
# Shape at 100 TB: broadcast k centroids × linear corpus scan, then ONE
# shuffle on the cell id carrying only (vec_id, cell) — vectors never
# move after assignment, no all-pairs stage; hot cells are ranked
# windows, left to AQE skew-split.
_CBS_CAP = 12


def q_cluster_balanced_sample(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_quant_spark("embedding")).alias("qe")
    )
    cents = e.where(F.col("vec_id") % 64 == 3).select(
        F.col("vec_id").alias("cent_id"), F.col("qe").alias("ce")
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "d", F.expr(_SQDIST.format(a="qe", b="ce"))
    )
    wv = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cent_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    wc = Window.partitionBy("cell").orderBy(
        F.expr("cast(conv(substr(md5(cast(vec_id as string)),1,15),16,10)"
               " as bigint)"),
        F.asc("vec_id"),
    )
    return assigned.select(
        "vec_id", "cell",
        F.row_number().over(wc).cast("long").alias("rk"),
    ).withColumn("kept", F.col("rk") <= _CBS_CAP)


def _sql_cluster_balanced() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, {_quant_duck('embedding')} AS qe FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, qe AS ce FROM e WHERE vec_id % 64 = 3
),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, len(e.qe) + 1),
               i -> (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)])
                    * (e.qe[CAST(i AS INT)] - c.ce[CAST(i AS INT)]))),
             c.cent_id) AS rn
    FROM e CROSS JOIN cents c) t
  WHERE rn = 1
)
SELECT vec_id, cell,
       CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
         CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT),
         vec_id) AS BIGINT) AS rk,
       ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
         CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT),
         vec_id) <= {_CBS_CAP} AS kept
FROM assigned
"""


# -- SemDeDup: cluster-then-prune semantic dedup --------------------------------
# The full SemDeDup recipe (Abbas et al. 2023, the standard semantic-curation
# pass): cluster the corpus in embedding space, then WITHIN each cluster drop
# every vector that is τ-similar to an already-kept one. Pairwise work only
# ever happens inside a cluster — the cluster id is the shuffle key, no
# all-pairs stage anywhere, which is the entire reason the recipe survives
# 100 TB. Keep rule: lowest vec_id wins (deterministic "keep first"; the
# paper's keep-farthest-from-centroid is a different argmin over the same
# within-cluster pair set). The real embeddings table has no near-dup
# structure, so — exactly like embedding_neardup_pairs above — both engines
# synthesize the same planted-cluster vectors from vec_id (50 clusters,
# intra-cluster cos ≈ 0.9975, inter-cluster sub-0.9), making the prune set
# non-trivial at every SF.
#
# Shape at 100 TB: centroid assignment = broadcast k × linear corpus scan;
# the within-cell self-join shuffles the corpus ONCE on the cell id; the
# pair stage is Σ|cell|² — bounded by the clustering, never n². The
# assignment branch is computed once per join side (two linear passes);
# a production pipeline would checkpoint the assignment table between the
# two stages (the kmeans_iter_assign op above is that producer).


def q_semdedup_cluster_prune(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_VEC_SPARK).alias("emb")
    )
    cents = e.where(F.col("vec_id") % 64 == 3).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("c_emb")
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "cs", F.expr(_cos_expr("emb", "c_emb"))
    )
    wc = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") == 1)
        .select("vec_id", "emb", F.col("cent_id").alias("cell"))
    )
    a = assigned.select(
        F.col("vec_id").alias("va"), F.col("emb").alias("ea"),
        F.col("cell").alias("ca"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vb"), F.col("emb").alias("eb"), "cell"
    )
    prunes = (
        a.join(b, (F.col("ca") == F.col("cell")) & (F.col("va") < F.col("vb")))
        .withColumn("cs", F.expr(_cos_expr("ea", "eb")))
        .where(F.col("cs") >= _ND_TAU)
        .groupBy("vb")
        .agg(F.min("va").alias("pruned_by"))
    )
    return (
        assigned.join(prunes, assigned.vec_id == prunes.vb, "left")
        .select(
            "vec_id",
            "cell",
            "pruned_by",
            F.col("pruned_by").isNull().alias("kept"),
        )
    )


def _sql_semdedup() -> str:
    cos_vc = _cos_duck("v.emb", "c.c_emb")
    cos_ab = _cos_duck("a.emb", "b.emb")
    return f"""
WITH v AS (
  SELECT vec_id, {_VEC_DUCK} AS emb FROM embeddings
),
c AS (
  SELECT vec_id AS cent_id, emb AS c_emb FROM v WHERE vec_id % 64 = 3
),
assigned AS (
  SELECT vec_id, emb, cent_id AS cell FROM (
    SELECT v.vec_id, v.emb, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {cos_vc} DESC, c.cent_id) AS rn
    FROM v CROSS JOIN c) t
  WHERE rn = 1
),
prunes AS (
  SELECT b.vec_id AS vb, MIN(a.vec_id) AS pruned_by
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {cos_ab} >= {_ND_TAU}
  GROUP BY b.vec_id
)
SELECT s.vec_id, s.cell, p.pruned_by, (p.pruned_by IS NULL) AS kept
FROM assigned s LEFT JOIN prunes p ON s.vec_id = p.vb
"""


# -- PQ-ADC ANN (product quantization + asymmetric distance computation) ------
# The third canonical ANN scale path next to IVF cells and LSH buckets: at
# 100 TB the index must be SMALLER than the vectors, and PQ is how — each
# 64-dim vector compresses to M=4 one-byte codes (a 64x memory reduction),
# and queries rank the whole corpus by table lookups over those codes
# (ADC: asymmetric distance — exact query subvector vs quantized corpus
# codeword), never touching the raw vectors after encode.
#
# Cross-engine exactness: all distances are integer squared distances over
# floor(x*1000) fixed-point subvectors, so train/encode/ADC produce
# bit-identical argmins on both engines (no float ranking anywhere).
# Shapes: the codebook is M*K = 64 rows (broadcast); encode is a broadcast
# crossJoin + map-side-combined min_by groupBy (the shuffle carries only
# (vec_id, m, best-struct) longs, never vectors); the query LUT is
# Q*M*K = 512 rows (broadcast); the ADC sum groupBy keys on (q_id, vec_id)
# — uniform by construction. The corpus's raw vectors are read exactly
# once, in the encode scan.
_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace (M * SUB = embedding dim 64)
_PQ_K = 16  # centroids per subspace; codebook = first K train rows
_PQ_SCALE = 1000  # fixed-point quantization: floor(x * SCALE)


def _pq_qsub_spark(col: str, m) -> str:
    """Quantized integer subvector `m` (0-based) of array column `col`."""
    start = f"({m} * {_PQ_SUB} + 1)"
    return (
        f"transform(slice({col}, {start}, {_PQ_SUB}),"
        f" x -> cast(floor(cast(x as double) * {_PQ_SCALE}) as bigint))"
    )


_PQ_ISQ_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)


def _pq_qsub_duck(col: str, m) -> str:
    lo = f"({m} * {_PQ_SUB} + 1)"
    hi = f"(({m} + 1) * {_PQ_SUB})"
    return (
        f"list_transform({col}[{lo}:{hi}],"
        f" x -> CAST(floor(CAST(x AS DOUBLE) * {_PQ_SCALE}) AS BIGINT))"
    )


def _pq_isq_duck(a: str, b: str) -> str:
    # |a-b|^2 = a.a - 2 a.b + b.b; all terms are integer-valued and far
    # below 2^53, so the double arithmetic is exact.
    def ldp(x, y):
        return (
            "list_dot_product("
            f"list_transform({x}, v -> CAST(v AS DOUBLE)),"
            f" list_transform({y}, v -> CAST(v AS DOUBLE)))"
        )

    return f"CAST({ldp(a, a)} - 2 * {ldp(a, b)} + {ldp(b, b)} AS BIGINT)"


def q_ann_pq_adc(spark, sf_dir):
    """PQ encode + ADC top-3: train a 4x16 codebook from 16 deterministic
    rows (vec_id ≡ 7 mod 31, < 496 — present at every sf), encode every
    vector to 4 subspace codes by integer-argmin, then rank each query's
    neighbors by the sum of LUT distances over those codes."""
    e = T(spark, sf_dir, "embeddings")
    train = e.where((F.col("vec_id") < 496) & (F.col("vec_id") % 31 == 7))
    cents = train.select(
        F.expr("(vec_id - 7) div 31").alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.expr(_pq_qsub_spark("embedding", m)).alias("c_q"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("mc"),
    ).select("k", F.col("mc.m").alias("m"), F.col("mc.c_q").alias("c_q"))

    # encode: corpus x broadcast codebook -> per-(vec, m) integer argmin.
    # min(struct(d, k)) is lexicographic, i.e. min distance then lowest
    # centroid index — and partially aggregates map-side.
    v_q = f"transform(slice(embedding, m * {_PQ_SUB} + 1, {_PQ_SUB}), x -> cast(floor(cast(x as double) * {_PQ_SCALE}) as bigint))"
    d_expr = _PQ_ISQ_SPARK.format(a=v_q, b="c_q")
    codes = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "m", "k", F.expr(d_expr).alias("d"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "k")).alias("best"))
        .select("vec_id", "m", F.col("best.k").alias("code"))
    )

    # query LUT: Q * M * K rows of exact (query subvector vs centroid)
    # integer distances — tiny, broadcast against the code table.
    lut = (
        e.where(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
        .crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "m",
            "k",
            F.expr(
                _PQ_ISQ_SPARK.format(
                    a=f"transform(slice(q_emb, m * {_PQ_SUB} + 1, {_PQ_SUB}), x -> cast(floor(cast(x as double) * {_PQ_SCALE}) as bigint))",
                    b="c_q",
                )
            ).alias("d"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.k),
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("q_id", F.col("vec_id").alias("nn_id"), "adc_dist", "rn")
    )


def _sql_ann_pq() -> str:
    c_q = _pq_qsub_duck("t.embedding", "ms.m")
    v_q = _pq_qsub_duck("e.embedding", "c.m")
    q_q = _pq_qsub_duck("q.q_emb", "c.m")
    return f"""
WITH ms AS (SELECT UNNEST([0, 1, 2, 3]) AS m),
train AS (
  SELECT (vec_id - 7) // 31 AS k, embedding FROM embeddings
  WHERE vec_id < 496 AND vec_id % 31 = 7),
cents AS (
  SELECT t.k, ms.m, {c_q} AS c_q FROM train t CROSS JOIN ms),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT e.vec_id, c.m, c.k AS code,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.m
             ORDER BY {_pq_isq_duck(v_q, 'c.c_q')}, c.k) AS rn
    FROM embeddings e CROSS JOIN cents c) t
  WHERE rn = 1),
q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
lut AS (
  SELECT q.q_id, c.m, c.k, {_pq_isq_duck(q_q, 'c.c_q')} AS d
  FROM q CROSS JOIN cents c),
adc AS (
  SELECT l.q_id, co.vec_id, SUM(l.d) AS adc_dist
  FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.k
  WHERE co.vec_id <> l.q_id
  GROUP BY l.q_id, co.vec_id)
SELECT q_id, vec_id AS nn_id, CAST(adc_dist AS BIGINT) AS adc_dist, rn FROM (
  SELECT q_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
  FROM adc) t
WHERE rn <= 3
"""


SIMILARITY = {
    "embedding_cosine_topk": (q_cosine_topk, SQL_TOPK_COS),
    "ann_ivf_bucketed": (q_ann_bucketed, SQL_ANN_BUCKET),
    "ann_lsh_bucketed": (q_ann_lsh_bucketed, _sql_ann_lsh()),
    "ann_pq_adc": (q_ann_pq_adc, _sql_ann_pq()),
    "semantic_dedup_twostage": (q_semantic_dedup, _sql_semantic_dedup()),
    "embedding_neardup_pairs": (q_embedding_neardup_pairs, _sql_neardup()),
    "kmeans_iter_assign": (q_kmeans_iter_assign, _sql_kmeans()),
    "semdedup_cluster_prune": (q_semdedup_cluster_prune, _sql_semdedup()),
    "cluster_balanced_sample": (q_cluster_balanced_sample, _sql_cluster_balanced()),
}
