"""semdedup_cluster_prune: cluster-then-prune semantic dedup.

The oracle gate hash-verifies Spark vs DuckDB; this test pins the whole
recipe (planted vectors → centroid assignment → within-cell τ-prune)
against an independent pure-Python/numpy twin, so a same-bug-both-engines
regression can't slip through the hash compare, and asserts the planted
structure actually produces a non-trivial prune set.
"""

import hashlib

import numpy as np

from monocator_spark.queries.relational import T
from monocator_spark.queries.similarity import (
    _ND_CLUSTERS,
    _ND_DIM,
    _ND_TAU,
    q_semdedup_cluster_prune,
)

SF_DIR = "/root/testdata/sf0.001"


def _h15(tag: str, key: int, k: int) -> int:
    h = hashlib.md5(f"{tag}|{key}|{k}".encode()).hexdigest()[:15]
    return int(h, 16) % 2001 - 1000


def _vec(vid: int) -> np.ndarray:
    return np.array(
        [
            _h15("emb", vid % _ND_CLUSTERS, k) / 1000.0
            + _h15("nz", vid, k) / 20000.0
            for k in range(_ND_DIM)
        ]
    )


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 4)


def test_semdedup_matches_python_twin(spark):
    ids = [
        r["vec_id"]
        for r in T(spark, SF_DIR, "embeddings").select("vec_id").collect()
    ]
    vecs = {vid: _vec(vid) for vid in ids}
    cents = {vid: v for vid, v in vecs.items() if vid % 64 == 3}

    cell = {
        vid: max(cents.items(), key=lambda kv: (_cos(v, kv[1]), -kv[0]))[0]
        for vid, v in vecs.items()
    }
    pruned_by = {}
    for vb in ids:
        cands = [
            va
            for va in ids
            if va < vb and cell[va] == cell[vb] and _cos(vecs[va], vecs[vb]) >= _ND_TAU
        ]
        if cands:
            pruned_by[vb] = min(cands)

    rows = q_semdedup_cluster_prune(spark, SF_DIR).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert r["cell"] == cell[r["vec_id"]]
        assert r["pruned_by"] == pruned_by.get(r["vec_id"])
        assert r["kept"] == (r["vec_id"] not in pruned_by)
    # planted clusters must make the prune non-trivial: most of each
    # 10-member cluster goes, at least the 50 keepers stay
    n_pruned = len(pruned_by)
    assert 0.5 * len(ids) < n_pruned < len(ids)
