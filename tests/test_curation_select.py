"""dedup_keep_best + perplexity_bucket: curation-selection invariants.

The oracle gate hash-verifies Spark vs DuckDB; these tests pin the
SEMANTICS — exactly one keeper per duplicate group and the keeper is the
argmax-quality member; terciles are balanced within every language — so a
same-bug-both-engines regression can't slip through the hash compare.
"""

from collections import Counter, defaultdict

from monocator_spark.queries.textops import q_dedup_keep_best, q_perplexity_bucket

SF_DIR = "/root/testdata/sf0.001"


def test_keep_best_one_argmax_keeper_per_group(spark):
    rows = q_dedup_keep_best(spark, SF_DIR).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["rep_id"]].append(r)
    assert sum(len(v) for v in groups.values()) == len(rows)
    for rep, members in groups.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1
        best = min(members, key=lambda m: (-m["n_tokens"], m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
    # the testdata's duplicate structure must actually exercise selection
    assert any(len(v) > 1 for v in groups.values())


def test_perplexity_terciles_balanced_per_lang(spark):
    rows = q_perplexity_bucket(spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in rows:
        assert r["bucket"] in ("head", "middle", "tail")
        by_lang[r["lang"]].append(r)
    for lang, members in by_lang.items():
        counts = Counter(m["bucket"] for m in members)
        # NTILE(3): bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        # the head tercile holds the lowest scores
        head_max = max(m["ppl_proxy"] for m in members if m["bucket"] == "head")
        tail_min = min(m["ppl_proxy"] for m in members if m["bucket"] == "tail")
        assert head_max <= tail_min
