"""PQ-ADC ANN twin test: the full product-quantization recipe (train ->
encode -> ADC rank) recomputed in numpy from the raw parquet, compared
row-for-row against the Spark query — independent of the DuckDB hash
compare, like the semdedup/kmeans twins."""

import numpy as np
import pyarrow.parquet as pq

from monocator_spark.queries.similarity import (
    _PQ_K,
    _PQ_M,
    _PQ_SCALE,
    _PQ_SUB,
    q_ann_pq_adc,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_pq(path):
    t = pq.read_table(f"{path}/embeddings.parquet")
    vec_ids = t["vec_id"].to_numpy()
    embs = np.stack([np.asarray(e, dtype=np.float32) for e in t["embedding"].to_pylist()])
    # fixed-point quantization: floor(double(x) * SCALE)
    qv = np.floor(embs.astype(np.float64) * _PQ_SCALE).astype(np.int64)
    train_mask = (vec_ids < 496) & (vec_ids % 31 == 7)
    train_ids = vec_ids[train_mask]
    ks = (train_ids - 7) // 31
    assert sorted(ks) == list(range(_PQ_K))
    # codebook[m][k] = quantized subvector m of train row k
    order = np.argsort(ks)
    cents = qv[train_mask][order]  # row k = centroid k (all subspaces)

    def sub(arr, m):
        return arr[..., m * _PQ_SUB : (m + 1) * _PQ_SUB]

    # encode: per (vec, m) argmin of integer squared distance, ties -> lowest k
    codes = np.empty((len(vec_ids), _PQ_M), dtype=np.int64)
    for m in range(_PQ_M):
        d = ((sub(qv, m)[:, None, :] - sub(cents, m)[None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d, axis=1)  # argmin takes first on ties

    rows = []
    for q_id in range(8):
        qi = np.nonzero(vec_ids == q_id)[0][0]
        lut = np.empty((_PQ_M, _PQ_K), dtype=np.int64)
        for m in range(_PQ_M):
            lut[m] = ((sub(qv[qi], m)[None, :] - sub(cents, m)) ** 2).sum(axis=1)
        adc = lut[np.arange(_PQ_M)[None, :], codes].sum(axis=1)
        cand = [(int(adc[i]), int(v)) for i, v in enumerate(vec_ids) if v != q_id]
        cand.sort()
        for rn, (dist, vid) in enumerate(cand[:3], start=1):
            rows.append((q_id, vid, dist, rn))
    return sorted(rows)


def test_pq_adc_matches_numpy_twin(spark):
    got = sorted(
        (r["q_id"], r["nn_id"], r["adc_dist"], r["rn"])
        for r in q_ann_pq_adc(spark, SF_DIR).collect()
    )
    expected = _numpy_pq(SF_DIR)
    assert got == expected
    assert len(got) == 8 * 3
