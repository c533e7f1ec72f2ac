"""Aspect-ratio bucketing + dataset-mixing weights, pinned against
pure-Python twins (Fraction-exact argmin; integer share arithmetic) over
the real testdata — independent of the DuckDB hash compare."""

import hashlib
from fractions import Fraction

from monocator_spark.queries.imaging import (
    _ASPECT_LADDER,
    q_image_aspect_bucket,
)
from monocator_spark.queries.relational import T
from monocator_spark.queries.textops import (
    _PACK_C,
    q_mix_weights_epochs,
    q_sequence_pack_chunks,
)

SF_DIR = "/root/testdata/sf0.001"


def _expected_bucket(w: int, h: int) -> int:
    """Exact rational argmin of |w/h - bw/bh|, lowest index on ties."""
    ar = Fraction(w, h)
    best = min(
        (abs(ar - Fraction(bw, bh)), i)
        for i, (bw, bh) in enumerate(_ASPECT_LADDER)
    )
    return best[1]


def test_aspect_bucket_matches_fraction_twin(spark):
    rows = q_image_aspect_bucket(spark, SF_DIR).collect()
    assert rows
    seen_buckets = set()
    for r in rows:
        w = 64 + (r["doc_id"] * 37) % 1985
        h = 64 + (r["doc_id"] * 101) % 1985
        assert (r["w"], r["h"]) == (w, h)
        i = _expected_bucket(w, h)
        assert r["bucket_idx"] == i
        assert (r["bucket_w"], r["bucket_h"]) == _ASPECT_LADDER[i]
        assert r["ar_ppm"] == w * 1000000 // h
        seen_buckets.add(i)
    # the synthesized dims actually spread across the ladder
    assert len(seen_buckets) >= 5


def test_mix_weights_matches_python_twin(spark):
    docs = (
        T(spark, SF_DIR, "documents").select("source", "text").collect()
    )
    toks = {}
    ndocs = {}
    for r in docs:
        n = len([t for t in r["text"].split(" ") if t])
        toks[r["source"]] = toks.get(r["source"], 0) + n
        ndocs[r["source"]] = ndocs.get(r["source"], 0) + 1
    weight = {
        s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 5 + 1
        for s in toks
    }
    tot_t, tot_w = sum(toks.values()), sum(weight.values())

    rows = {r["source"]: r for r in q_mix_weights_epochs(spark, SF_DIR).collect()}
    assert set(rows) == set(toks)
    for s, r in rows.items():
        nat = toks[s] * 1000000 // tot_t
        tgt = weight[s] * 1000000 // tot_w
        assert r["n_docs"] == ndocs[s]
        assert r["n_tokens"] == toks[s]
        assert r["weight"] == weight[s]
        assert r["natural_ppm"] == nat
        assert r["target_ppm"] == tgt
        assert r["epochs_milli"] == tgt * 1000 // max(nat, 1)
    # shares are real distributions (floor-division slack < |sources| ppm)
    assert 1000000 - len(rows) < sum(r["target_ppm"] for r in rows.values()) <= 1000000
    # both up- and down-sampled sources exist in the testdata mix
    assert any(r["epochs_milli"] > 1000 for r in rows.values())
    assert any(r["epochs_milli"] < 1000 for r in rows.values())

def test_sequence_pack_matches_python_twin(spark):
    docs = (
        T(spark, SF_DIR, "documents")
        .select("source", "doc_id", "text")
        .collect()
    )
    by_src = {}
    for r in docs:
        n = len([t for t in r["text"].split(" ") if t])
        by_src.setdefault(r["source"], []).append((r["doc_id"], n))
    exp = {}
    for src, ds in by_src.items():
        off = 0
        for doc, n in sorted(ds):
            if n > 0:
                cf, cl = off // _PACK_C, (off + n - 1) // _PACK_C
                exp[doc] = (src, n, off, cf, cl, cl - cf + 1)
            off += n

    rows = q_sequence_pack_chunks(spark, SF_DIR).collect()
    assert len(rows) == len(exp)
    for r in rows:
        assert (
            r["source"], r["n_tokens"], r["start_off"],
            r["chunk_first"], r["chunk_last"], r["n_chunks"],
        ) == exp[r["doc_id"]]
    # packing really spans boundaries somewhere in the testdata
    assert any(r["n_chunks"] > 1 for r in rows)
    # chunks are contiguous per source: next doc starts where prior ended
    for src, ds in by_src.items():
        tot = sum(n for _, n in ds)
        last = max(
            (r["start_off"] + r["n_tokens"]) for r in rows if r["source"] == src
        )
        assert last == tot

def test_caption_filter_matches_python_twin(spark):
    from monocator_spark.queries.imaging import (
        _CIF_MAX_AR,
        _CIF_MAX_CAP_CHARS,
        _CIF_MIN_CAP_TOK,
        _CIF_MIN_SIDE,
        q_caption_image_filter,
    )

    texts = {
        r["doc_id"]: r["text"]
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rows = q_caption_image_filter(spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    seen = set()
    for r in rows:
        w = 64 + (r["doc_id"] * 37) % 1985
        h = 64 + (r["doc_id"] * 101) % 1985
        cap = " ".join([t for t in texts[r["doc_id"]].split(" ") if t][:12])
        if min(w, h) < _CIF_MIN_SIDE:
            v = "undersized"
        elif max(w, h) > _CIF_MAX_AR * min(w, h):
            v = "extreme_ar"
        elif r["cap_tokens"] < _CIF_MIN_CAP_TOK:
            v = "short_caption"
        elif len(cap) > _CIF_MAX_CAP_CHARS:
            v = "long_caption"
        else:
            v = "ok"
        assert (r["w"], r["h"]) == (w, h)
        assert r["cap_tokens"] == len([t for t in cap.split(" ") if t])
        assert r["cap_chars"] == len(cap)
        assert r["verdict"] == v
        seen.add(v)
    # the filter's reject AND accept paths both fire on the testdata
    assert "ok" in seen and len(seen) >= 3

def test_cluster_balanced_sample_matches_numpy_twin(spark):
    import numpy as np

    from monocator_spark.queries.similarity import (
        _CBS_CAP,
        _KM_Q,
        q_cluster_balanced_sample,
    )

    rows_in = (
        T(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows_in], dtype=np.int64)
    qe = np.floor(
        np.array([r["embedding"] for r in rows_in], dtype=np.float64) * _KM_Q
    ).astype(np.int64)
    cmask = ids % 64 == 3
    cent_ids, cents = ids[cmask], qe[cmask]
    # exact integer squared distances; nearest centroid, cent_id tiebreak
    d = ((qe[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = {}
    for i, v in enumerate(ids):
        tied = np.flatnonzero(d[i] == d[i].min())
        cell[int(v)] = int(cent_ids[tied].min())  # cent_id tiebreak

    def hkey(v):
        return (int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16), v)

    by_cell = {}
    for v in ids:
        by_cell.setdefault(cell[int(v)], []).append(int(v))
    exp = {}
    for c, vs in by_cell.items():
        for rk, v in enumerate(sorted(vs, key=hkey), start=1):
            exp[v] = (c, rk, rk <= _CBS_CAP)

    got = q_cluster_balanced_sample(spark, SF_DIR).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r["cell"], r["rk"], r["kept"]) == exp[r["vec_id"]]
    assert any(r["kept"] for r in got) and any(not r["kept"] for r in got)
