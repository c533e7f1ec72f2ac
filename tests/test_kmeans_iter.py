"""kmeans_iter_assign: one full Lloyd iteration in exact fixed-point.

The oracle gate hash-verifies Spark vs DuckDB at sf0.01; this test pins the
whole iteration (quantize → seed → assign → centroid update → reassign)
against an independent pure-Python/numpy twin so a same-bug-both-engines
regression can't slip through the hash compare.
"""

import math

import numpy as np

from monocator_spark.queries.relational import T
from monocator_spark.queries.similarity import _KM_Q, q_kmeans_iter_assign

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_iteration_matches_python_twin(spark):
    vecs = {
        r["vec_id"]: np.array(
            [math.floor(float(x) * _KM_Q) for x in r["embedding"]], dtype=np.int64
        )
        for r in T(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    cents0 = {vid: v for vid, v in vecs.items() if vid % 64 == 3}

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            best = min(
                cents.items(), key=lambda kv: (int(((v - kv[1]) ** 2).sum()), kv[0])
            )
            out[vid] = (best[0], int(((v - best[1]) ** 2).sum()))
        return out

    a0 = assign(cents0)
    # centroid update: floor(sum/count) per dimension
    cells = {}
    for vid, (c, _) in a0.items():
        cells.setdefault(c, []).append(vecs[vid])
    cents1 = {
        c: np.array(
            [math.floor(s / len(vs)) for s in np.stack(vs).sum(axis=0)],
            dtype=np.int64,
        )
        for c, vs in cells.items()
    }
    a1 = assign(cents1)

    rows = q_kmeans_iter_assign(spark, SF_DIR).collect()
    assert len(rows) == len(vecs)
    moved = 0
    for r in rows:
        assert r["cell0"] == a0[r["vec_id"]][0]
        assert r["cell1"] == a1[r["vec_id"]][0]
        assert r["moved"] == (r["cell0"] != r["cell1"])
        assert r["d1"] == a1[r["vec_id"]][1]
        moved += r["moved"]
    # the update must actually move some vectors, else the op is a no-op
    assert 0 < moved < len(rows)
