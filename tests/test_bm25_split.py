"""BM25 top-k + hash split assignment: pure-Python twins at sf0.001.

The oracle gate hash-verifies both against DuckDB at sf0.01; these tests
re-derive the math independently (regex tokenize → exact-integer BM25
ratio; md5 permille split) so a same-bug-both-engines regression can't
slip through the hash compare.
"""

import hashlib
import re
from collections import Counter

from monocator_spark.queries.relational import T
from monocator_spark.queries.textops import q_bm25_topk, q_split_assign

SF_DIR = "/root/testdata/sf0.001"

_TOK = re.compile(r"[^a-z]+")


def _terms(text):
    return [t for t in _TOK.split(text.lower()) if len(t) >= 3]


def test_bm25_matches_python_twin(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    n = len(docs)
    tf = {d: Counter(_terms(t)) for d, t in docs.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    corpus_l = sum(dl.values())
    df = Counter(term for c in tf.values() for term in c)

    def score(d, term):
        t = tf[d][term]
        return round(
            22 * corpus_l * t * n
            / ((10 * corpus_l * t + 3 * corpus_l + 9 * dl[d] * n) * df[term]),
            6,
        )

    expected = {}
    for d, c in tf.items():
        ranked = sorted(c, key=lambda term: (-score(d, term), term))[:5]
        expected[d] = [(term, c[term], score(d, term)) for term in ranked]

    rows = q_bm25_topk(spark, SF_DIR).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r)
    assert set(got) == {d for d, c in tf.items() if c}
    for d, rs in got.items():
        rs.sort(key=lambda r: r["rk"])
        assert [(r["term"], r["tf"], r["score"]) for r in rs] == expected[d]
        assert all(r["dl"] == dl[d] for r in rs)
        # score is monotone non-increasing down the ranking
        assert all(a["score"] >= b["score"] for a, b in zip(rs, rs[1:]))


def test_split_assign_matches_md5_permille(spark):
    rows = q_split_assign(spark, SF_DIR).collect()
    assert rows
    n_train = 0
    for r in rows:
        pm = (
            int(hashlib.md5(f"split|{r['doc_id']}".encode()).hexdigest()[:15], 16)
            % 1000
        )
        assert r["permille"] == pm
        exp = "train" if pm < 900 else ("val" if pm < 950 else "test")
        assert r["split"] == exp
        n_train += exp == "train"
    # 900‰ target: loose band at tiny sf, but all three splits exist
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}
    assert 0.8 < n_train / len(rows) < 0.97
