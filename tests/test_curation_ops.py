"""Corpus-curation ops: Gopher-style repetition stats + PII scrubbing.

The oracle gate hash-verifies both against DuckDB at sf0.01; these tests
pin the per-doc math against an independent pure-Python twin and the
planted-PII arithmetic, so a same-bug-both-engines regression can't slip
through the hash compare.
"""

from collections import Counter

from monocator_spark.queries.relational import T
from monocator_spark.queries.textops import (
    _REP_DUP_BG,
    _REP_MIN_DISTINCT,
    _REP_TOP_FRAC,
    q_doc_repetition_stats,
    q_pii_scrub_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def test_repetition_stats_match_python_twin(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rows = q_doc_repetition_stats(spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    flagged = 0
    for r in rows:
        ws = [t for t in texts[r["doc_id"]].split(" ") if t]
        cnt = Counter(ws)
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        assert r["n_words"] == len(ws)
        assert r["n_distinct"] == len(cnt)
        assert r["top_word_n"] == max(cnt.values())
        assert r["n_bigrams"] == len(bgs)
        assert r["distinct_ratio"] == round(len(cnt) / len(ws), 6)
        assert r["top_word_frac"] == round(max(cnt.values()) / len(ws), 6)
        exp_dup = round(1 - len(set(bgs)) / len(bgs), 6) if bgs else 0.0
        assert r["dup_bigram_frac"] == exp_dup
        exp_flag = (
            r["distinct_ratio"] < _REP_MIN_DISTINCT
            or r["top_word_frac"] > _REP_TOP_FRAC
            or r["dup_bigram_frac"] > _REP_DUP_BG
        )
        assert r["flagged"] == exp_flag
        flagged += exp_flag
    assert 0 < flagged < len(rows)  # both branches fire


def test_pii_scrub_counts_and_lengths(spark):
    import re

    lens = {
        r["doc_id"]: len(r["text"])
        for r in T(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rows = q_pii_scrub_stats(spark, SF_DIR).collect()
    assert len(rows) == len(lens)
    for r in rows:
        doc = r["doc_id"]
        # planted-PII arithmetic: counts are a pure function of doc_id
        assert r["n_emails"] == (doc % 3 == 0) + (doc % 6 == 0)
        assert r["n_phones"] == (doc % 5 == 0)
        assert r["n_ips"] == (doc % 7 == 0)
        assert r["has_pii"] == (r["n_emails"] + r["n_phones"] + r["n_ips"] > 0)
        # length delta: each match collapsed to its fixed token
        plant = 0
        removed = 0
        if doc % 3 == 0:
            em = f"user{doc}@ex{doc % 7}.com"
            plant += len(" contact ") + len(em)
            removed += len(em) - len("<EMAIL>")
        if doc % 6 == 0:
            em = f"admin{doc}@mail.org"
            plant += len(" cc ") + len(em)
            removed += len(em) - len("<EMAIL>")
        if doc % 5 == 0:
            ph = f"+1-555-{1000 + doc % 9000}"
            plant += len(" call ") + len(ph)
            removed += len(ph) - len("<PHONE>")
        if doc % 7 == 0:
            ip = f"10.{doc % 256}.0.{doc % 100}"
            plant += len(" host ") + len(ip)
            removed += len(ip) - len("<IP>")
        assert r["orig_len"] == lens[doc] + plant
        assert r["scrub_len"] == r["orig_len"] - removed

    # a third regex engine (Python re) agrees span-for-span on one doc
    doc = next(d for d in lens if d % 3 == 0 and d % 5 == 0 and d % 7 == 0)
    row = next(r for r in rows if r["doc_id"] == doc)
    t2 = (
        "x"  # the base text has no '@' or digits, so a stand-in suffices
        + f" contact user{doc}@ex{doc % 7}.com"
        + (f" cc admin{doc}@mail.org" if doc % 6 == 0 else "")
        + f" call +1-555-{1000 + doc % 9000}"
        + f" host 10.{doc % 256}.0.{doc % 100}"
    )
    assert row["n_emails"] == len(
        re.findall(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", t2)
    )
    assert row["n_phones"] == len(re.findall(r"\+1-555-[0-9]{4}", t2))
    assert row["n_ips"] == len(re.findall(r"10\.[0-9]+\.[0-9]+\.[0-9]+", t2))


def test_asof_join_matches_python_twin(spark):
    """q_asof_join_events (union + running-last window) against a pure-Python
    per-user scan — including the no-prior-view -1 branch and the tie
    convention (view sorts before purchase at equal ts)."""
    from monocator_spark.queries.relational import q_asof_join_events

    ev = sorted(
        T(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_type"] != "view"),
    )
    # testdata invariant the window ordering relies on: no (user, ts) dupes
    keys = [(r["user_id"], r["ts"]) for r in ev]
    assert len(keys) == len(set(keys))

    exp = {}
    last_view = {}
    for r in ev:
        if r["event_type"] == "view":
            last_view[r["user_id"]] = r
        elif r["event_type"] == "purchase":
            v = last_view.get(r["user_id"])
            exp[r["event_id"]] = (
                v["event_id"] if v else -1,
                round(v["value"], 2) if v else 0.0,
                int((r["ts"] - v["ts"]).total_seconds() * 1000) if v else -1,
            )
    got = {
        r["event_id"]: (r["view_event_id"], r["view_value"], r["lag_ms"])
        for r in q_asof_join_events(spark, SF_DIR).collect()
    }
    assert got == exp and len(got) > 0
    assert any(v[0] == -1 for v in got.values())  # the no-prior branch fires


def test_source_curation_rollup_matches_python_twin(spark):
    import hashlib

    from monocator_spark.queries.textops import (
        _CUR_DROP_DUP,
        _CUR_DROP_SHORT,
        _CUR_SAMPLE_CHARS,
        _CUR_SAMPLE_EN,
        q_source_curation_rollup,
    )

    docs = T(spark, SF_DIR, "documents").select(
        "source", "lang", "n_chars", "text"
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r)
    exp = {}
    for src, rows in by_src.items():
        n = len(rows)
        uniq = len({hashlib.md5(r["text"].encode()).hexdigest() for r in rows})
        langs = Counter(r["lang"] for r in rows)
        major = max((c, lang) for lang, c in langs.items())[1]
        dup = round(1 - uniq / n, 6)
        short = round(sum(r["n_chars"] < 100 for r in rows) / n, 6)
        mean = round(sum(r["n_chars"] for r in rows) / n, 6)
        en = round(langs.get("en", 0) / n, 6)
        if dup > _CUR_DROP_DUP or short > _CUR_DROP_SHORT:
            dec = "drop"
        elif mean < _CUR_SAMPLE_CHARS or en < _CUR_SAMPLE_EN:
            dec = "sample"
        else:
            dec = "keep"
        exp[src] = (n, uniq, major, dup, short, mean, en, dec)
    got = {
        r["source"]: (
            r["n_docs"], r["n_unique"], r["major_lang"], r["dup_frac"],
            r["short_frac"], r["mean_chars"], r["en_frac"], r["decision"],
        )
        for r in q_source_curation_rollup(spark, SF_DIR).collect()
    }
    assert got == exp and len(got) > 1
    assert len({v[-1] for v in got.values()}) > 1  # more than one decision fires


def test_group_quantiles_exact_matches_interpolation_twin(spark):
    from monocator_spark.queries.textops import (
        _QUANTILE_PS,
        q_group_quantiles_exact,
    )

    docs = T(spark, SF_DIR, "documents").select("lang", "n_chars").collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    exp = {}
    for lang, vs in by_lang.items():
        vs.sort()
        qs = []
        for p in _QUANTILE_PS:
            pos = (len(vs) - 1) * p
            lo, frac = int(pos), pos - int(pos)
            hi = lo + (1 if frac else 0)
            qs.append(round(vs[lo] + (vs[hi] - vs[lo]) * frac, 6))
        exp[lang] = (len(vs), *qs)
    got = {
        r["lang"]: (r["n"], r["p25"], r["p50"], r["p75"])
        for r in q_group_quantiles_exact(spark, SF_DIR).collect()
    }
    assert got == exp and len(got) > 1
    # interpolation actually fires somewhere (a fractional rank between two
    # distinct values), so the test would catch a floor-only implementation
    assert any(
        q != int(q) for v in got.values() for q in v[1:]
    )


def test_winsorized_stats_match_python_twin(spark):
    from monocator_spark.queries.textops import q_winsorized_stats_group

    docs = T(spark, SF_DIR, "documents").select("lang", "n_chars").collect()
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])

    def quantile(vs, p):
        pos = (len(vs) - 1) * p
        lo, frac = int(pos), pos - int(pos)
        hi = lo + (1 if frac else 0)
        return vs[lo] + (vs[hi] - vs[lo]) * frac

    exp = {}
    for lang, vs in by_lang.items():
        vs.sort()
        p25, p75 = quantile(vs, 0.25), quantile(vs, 0.75)
        cl = [max(p25, min(p75, v)) for v in vs]
        exp[lang] = (
            len(vs),
            round(p25, 6),
            round(p75, 6),
            round(sum(cl) / len(vs), 6),
            sum(v < p25 for v in vs),
            sum(v > p75 for v in vs),
        )
    got = {
        r["lang"]: (
            r["n"], r["p25"], r["p75"], r["w_mean"],
            r["n_clip_lo"], r["n_clip_hi"],
        )
        for r in q_winsorized_stats_group(spark, SF_DIR).collect()
    }
    assert got == exp and len(got) > 1
    assert any(v[4] + v[5] > 0 for v in got.values())  # clipping fires
