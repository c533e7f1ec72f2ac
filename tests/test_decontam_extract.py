"""Decontamination, HTML extraction, and paragraph-level dedup ops.

The oracle gate hash-verifies all three against DuckDB at sf0.01; these
tests pin the per-doc math against an independent pure-Python twin (real
`re` machinery for the HTML op — a third regex engine next to Java regex
and RE2), so a same-bug-both-engines regression can't slip through the
hash compare.
"""

import hashlib
import re

from monocator_spark.queries.relational import T
from monocator_spark.queries.textops import (
    _PARA_W,
    q_contamination_ngram,
    q_html_text_extract,
    q_paragraph_dedup_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }


def _shingles(text: str) -> set:
    ws = text.split(" ")
    n = max(len(ws) - 4, 1)
    return {" ".join(ws[i : i + 5]) for i in range(n)}


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_contamination_matches_python_twin(spark):
    texts = _texts(spark)
    bench = set()
    for doc_id, text in texts.items():
        if doc_id % 97 == 0:
            bench |= _shingles(text)
    rows = q_contamination_ngram(spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    contaminated = 0
    for r in rows:
        sh = _shingles(texts[r["doc_id"]])
        hit = len(sh & bench)
        assert r["n_ngrams"] == len(sh)
        assert r["n_hit"] == hit
        assert r["contam_frac"] == round(hit / len(sh), 6)
        assert r["is_eval"] == (r["doc_id"] % 97 == 0)
        assert r["contaminated"] == (hit > 0 and r["doc_id"] % 97 != 0)
        contaminated += r["contaminated"]
    # every eval doc is fully self-contaminated; the corpus carries dups,
    # so at least one NON-eval doc must be flagged for the op to mean
    # anything at this sf
    assert contaminated >= 1


def test_html_extract_matches_python_re(spark):
    texts = _texts(spark)
    rows = q_html_text_extract(spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    for r in rows:
        doc_id, text = r["doc_id"], texts[r["doc_id"]]
        ad = (
            f'<div class="ad">buy now {doc_id % 11}</div>'
            if doc_id % 4 == 0
            else ""
        )
        html = (
            f"<html><head><title>Doc {doc_id}</title>"
            f"<script>var x={doc_id % 13};</script></head>"
            f"<body><nav>home | about | search</nav><p>{text}</p>{ad}"
            f"<footer>(c) site {doc_id % 50}</footer></body></html>"
        )
        clean = re.sub("<script>.*?</script>", " ", html)
        clean = re.sub("<[^>]*>", " ", clean)
        clean = re.sub(" +", " ", clean).strip()
        assert r["title"] == f"Doc {doc_id}"
        assert r["html_len"] == len(html)
        assert r["clean_len"] == len(clean)
        assert r["n_tags"] == len(re.findall("<[^>]*>", html))
        assert r["clean_fp"] == _md5long(clean)


def test_paragraph_dedup_matches_python_twin(spark):
    texts = _texts(spark)
    first_seen = {}  # hash -> okey of corpus-wide first occurrence
    paras_by_doc = {}
    for doc_id in texts:
        ws = [t for t in texts[doc_id].split(" ") if t]
        n_paras = -(-len(ws) // _PARA_W)
        paras = [
            " ".join(ws[j * _PARA_W : (j + 1) * _PARA_W]) for j in range(n_paras)
        ]
        paras_by_doc[doc_id] = paras
        for j, p in enumerate(paras):
            h = _md5long(p)
            okey = doc_id * 1000 + j
            if h not in first_seen or okey < first_seen[h]:
                first_seen[h] = okey
    rows = q_paragraph_dedup_stats(spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    dup_docs = 0
    for r in rows:
        paras = paras_by_doc[r["doc_id"]]
        n_dup = sum(
            1
            for j, p in enumerate(paras)
            if r["doc_id"] * 1000 + j > first_seen[_md5long(p)]
        )
        assert r["n_paras"] == len(paras)
        assert r["n_dup_paras"] == n_dup
        assert r["dup_frac"] == round(n_dup / len(paras), 6)
        assert r["keep"] == (n_dup * 2 <= len(paras))
        dup_docs += n_dup > 0
    # the corpus carries exact-dup docs, so cross-doc paragraph dups exist
    assert dup_docs >= 1
