"""CLIP-style image-text alignment gate (clip_alignment_gate) vs a numpy
twin: integer fixed-point cosine threshold between the image embedding
(floor(x*1000)) and the deterministic caption-derived vector, verdict by
integer cross-multiplication (never a float comparison)."""
import hashlib
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cap_vec(text: str, dim: int, n_tok: int) -> np.ndarray:
    toks = [t for t in text.split(" ") if t != ""][:n_tok]
    return np.array(
        [
            sum(_md5long(f"{t}|{d}") % 201 - 100 for t in toks)
            for d in range(dim)
        ],
        dtype=np.int64,
    )


def test_clip_gate_matches_numpy_twin(spark):
    from monocator_spark.queries.imaging import (
        _CLIP_CAP_TOKENS,
        _CLIP_DIM,
        _CLIP_TAU_SQ100,
        q_clip_alignment_gate,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    embs = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[["vec_id", "embedding"]]
    expected = {}
    emb_of = dict(zip(embs["vec_id"], embs["embedding"]))
    for _, row in docs.iterrows():
        if row["doc_id"] not in emb_of:
            continue
        img = np.floor(
            np.asarray(emb_of[row["doc_id"]], dtype=np.float64) * 1000
        ).astype(np.int64)
        cap = _cap_vec(row["text"], _CLIP_DIM, _CLIP_CAP_TOKENS)
        dot = int(img @ cap)
        na, nb = int(img @ img), int(cap @ cap)
        aligned = (
            nb > 0 and dot >= 0 and 100 * dot * dot >= _CLIP_TAU_SQ100 * na * nb
        )
        expected[row["doc_id"]] = (dot, na, nb, aligned)

    got = {
        r["doc_id"]: (r["dot_q"], r["na_q"], r["nb_q"], r["aligned"])
        for r in q_clip_alignment_gate(spark, SF_DIR).collect()
    }
    assert got == expected
    assert len(got) == len(expected) > 0
    # the τ = 0.1 gate must actually discriminate on this corpus
    verdicts = {v[3] for v in got.values()}
    assert verdicts == {True, False}


def test_clip_gate_zero_token_captions_cross_engine(spark, tmp_root):
    """The ADVICE-r4 scenario the shipped testdata cannot exercise: docs
    whose caption yields ZERO tokens (empty / whitespace-only / NULL text)
    must (a) still appear in the output — not vanish through the explode —
    with a zero caption vector, and (b) gate aligned=False (nb_q = 0 has
    no direction), identically on Spark and the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_spark.queries.imaging import SQL_CLIP_GATE, q_clip_alignment_gate

    sf_dir = f"{tmp_root}/clip_degenerate"
    Path(sf_dir).mkdir(parents=True, exist_ok=True)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a plain caption with tokens", "", "   ", None], pa.string()
            ),
        }
    )
    pq.write_table(docs, f"{sf_dir}/documents.parquet")
    vec = [float((i % 7) - 3) / 4 for i in range(64)]
    embs = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array([vec] * 4, pa.list_(pa.float32())),
        }
    )
    pq.write_table(embs, f"{sf_dir}/embeddings.parquet")

    got = {
        r["doc_id"]: (r["dot_q"], r["na_q"], r["nb_q"], r["aligned"])
        for r in q_clip_alignment_gate(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exp = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), bool(r[4]))
        for r in con.execute(SQL_CLIP_GATE).fetchall()
    }
    assert got == exp
    # all four docs present — the degenerate ones did not vanish
    assert set(got) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert got[d][2] == 0 and got[d][3] is False  # nb_q=0 → not aligned
