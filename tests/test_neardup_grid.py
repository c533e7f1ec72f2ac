"""Exact grid-blocked embedding near-dup (queries/similarity.py).

The op's exactness rests on one inequality — for unit vectors,
cos(x, y) ≥ τ ⟹ |x̂ᵢ − ŷᵢ| ≤ √(2−2τ) for every coordinate — plus the
grid adjacency argument (|Δ| ≤ w ⟹ floor-buckets differ by ≤ 1). This
pins both halves: the bound on random vectors, and on the planted-cluster
fixture that the candidate set is a strict subset of all-pairs (pruning
is real) while the final output equals brute force.
"""

from __future__ import annotations

import numpy as np

from monocator_spark.queries.similarity import (
    _DOT,
    _ND_TAU,
    _ND_W,
    _VEC_SPARK,
    q_embedding_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def test_coordinate_bound_inequality():
    rng = np.random.RandomState(5)
    for _ in range(200):
        x = rng.randn(16)
        y = rng.randn(16)
        x, y = x / np.linalg.norm(x), y / np.linalg.norm(y)
        cos = float(x @ y)
        if cos >= 0.985:
            w = (2 - 2 * 0.985) ** 0.5
            assert np.max(np.abs(x - y)) <= w + 1e-12
    # and adversarially: force a high-cosine pair, check every coordinate
    x = rng.randn(16)
    x /= np.linalg.norm(x)
    y = x + 0.02 * rng.randn(16)
    y /= np.linalg.norm(y)
    cos = float(x @ y)
    assert cos >= 0.985
    assert np.max(np.abs(x - y)) <= (2 - 2 * cos) ** 0.5 + 1e-12


def test_grid_output_equals_brute_force_and_prunes(spark):
    from pyspark.sql import functions as F

    from monocator_spark.queries.relational import T

    got = sorted(
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in q_embedding_neardup_pairs(spark, SF_DIR).collect()
    )
    # brute force over the same synthesized vectors, in numpy
    e = (
        T(spark, SF_DIR, "embeddings")
        .select("vec_id", F.expr(_VEC_SPARK).alias("emb"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    m = np.array([r["emb"] for r in e], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 4)
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = cos[iu, ju] >= _ND_TAU
    order = np.argsort(ids)
    inv_ids = ids  # vec_ids as stored
    exp = sorted(
        (
            int(min(inv_ids[i], inv_ids[j])),
            int(max(inv_ids[i], inv_ids[j])),
            float(cos[i, j]),
        )
        for i, j in zip(iu[keep], ju[keep])
    )
    assert got == exp and len(got) > 0
    del order

    # the candidate join really prunes: count candidates (pre-verify)
    nrm = F.expr(_DOT.format(a="emb", b="emb"))
    pts = (
        T(spark, SF_DIR, "embeddings")
        .select("vec_id", F.expr(_VEC_SPARK).alias("emb"))
        .select(
            "vec_id",
            F.floor(F.col("emb")[0] / F.sqrt(nrm) / F.lit(_ND_W)).alias("b0"),
            F.floor(F.col("emb")[1] / F.sqrt(nrm) / F.lit(_ND_W)).alias("b1"),
        )
    )
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probe = (
        pts.select(F.col("vec_id").alias("vb"), "b0", "b1", F.explode(offs).alias("d0"))
        .select("vb", (F.col("b0") + F.col("d0")).alias("nb0"), "b1", F.explode(offs).alias("d1"))
        .select("vb", "nb0", (F.col("b1") + F.col("d1")).alias("nb1"))
    )
    n_cand = pts.join(
        probe,
        (F.col("b0") == F.col("nb0"))
        & (F.col("b1") == F.col("nb1"))
        & (F.col("vec_id") < F.col("vb")),
    ).count()
    n_all = len(ids) * (len(ids) - 1) // 2
    assert len(got) <= n_cand < n_all  # superset of answers, subset of all-pairs
