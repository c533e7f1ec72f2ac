"""Exact-substring span dedup + per-domain cap, pinned against pure-Python
twins over the real testdata (independent of the DuckDB hash compare, so a
same-bug-both-engines regression can't slip through)."""

from collections import Counter

from monocator_spark.queries.relational import T
from monocator_spark.queries.textops import (
    _DOMAIN_CAP,
    _SPAN_W,
    q_domain_cap_sample,
    q_substring_dedup_spans,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_spans(texts: dict) -> set:
    """(doc_id, span_start, span_end, n_windows) maximal duplicated spans."""
    windows = {}  # (doc, pos) -> window text
    for doc, text in texts.items():
        ws = [t for t in text.split(" ") if t]
        for i in range(1, len(ws) - _SPAN_W + 2):
            windows[(doc, i)] = " ".join(ws[i - 1 : i - 1 + _SPAN_W])
    occ = Counter(windows.values())
    dup_pos = {}  # doc -> sorted duplicated window starts
    for (doc, pos), sp in windows.items():
        if occ[sp] >= 2:
            dup_pos.setdefault(doc, []).append(pos)
    out = set()
    for doc, poss in dup_pos.items():
        poss.sort()
        run = [poss[0]]
        for p in poss[1:]:
            if p == run[-1] + 1:
                run.append(p)
            else:
                out.add((doc, run[0], run[-1] + _SPAN_W - 1, len(run)))
                run = [p]
        out.add((doc, run[0], run[-1] + _SPAN_W - 1, len(run)))
    return out


def test_spans_match_python_twin(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    expected = _python_spans(texts)
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in q_substring_dedup_spans(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected  # the testdata actually contains duplicated spans
    # islands really merge: at least one span wider than a single window
    assert any(n > 1 for (_, _, _, n) in expected)


def test_domain_cap_matches_python_twin(spark):
    import hashlib

    rows = q_domain_cap_sample(spark, SF_DIR).collect()
    docs = [(r["doc_id"], r["source"]) for r in rows]

    def key(doc_id):
        return (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16), doc_id)

    by_src = {}
    for doc, src in docs:
        by_src.setdefault(src, []).append(doc)
    exp = {}
    for src, ds in by_src.items():
        for rk, doc in enumerate(sorted(ds, key=key), start=1):
            exp[doc] = (rk, rk <= _DOMAIN_CAP)
    for r in rows:
        assert (r["rk"], r["kept"]) == exp[r["doc_id"]]
    # both branches fire
    assert any(r["kept"] for r in rows) and any(not r["kept"] for r in rows)
