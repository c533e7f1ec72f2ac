"""Connected components over LSH candidate edges (dedup_connected_components).

Two independent pins:
1. a synthetic long-chain graph that needs multiple propagation rounds —
   the branch the real testdata (near-clique duplicate clusters) never
   exercises — checked against the obvious answer;
2. the full op on the driver testdata checked against a pure-Python
   union-find twin over the same Spark-computed LSH pair list, so
   transitivity is verified independently of the DuckDB recursive-CTE
   oracle.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def test_chain_needs_multiple_rounds(spark):
    from monocator_spark.queries.textops import _connected_components

    # path graph 0-1-2-...-9 plus a disjoint triangle {20,21,22} and a
    # singleton edge pair {30,31}; min label must travel 9 hops
    chain = [(i, i + 1) for i in range(9)]
    extra = [(20, 21), (21, 22), (20, 22), (30, 31)]
    rows = [(a, b) for a, b in chain + extra]
    pairs = spark.createDataFrame(rows, "src: long, dst: long")
    edges = pairs.unionByName(
        pairs.selectExpr("dst as src", "src as dst")
    )
    got = {
        r["node"]: r["lbl"] for r in _connected_components(edges, spark).collect()
    }
    assert got == {
        **{i: 0 for i in range(10)},
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the final roots
    return {x: find(x) for x in parent}


def test_matches_union_find_twin(spark):
    from monocator_spark.queries.textops import (
        q_dedup_connected_components,
        q_minhash_lsh_pairs,
    )

    pairs = [
        (r["doc1"], r["doc2"])
        for r in q_minhash_lsh_pairs(spark, SF_DIR).collect()
    ]
    roots = _union_find(pairs)
    got = q_dedup_connected_components(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(got) == n_docs  # every document mapped, exactly once
    sizes = {}
    rep_of = {}
    for r in got:
        exp_rep = roots.get(r["doc_id"], r["doc_id"])
        assert r["rep_id"] == exp_rep, (r, exp_rep)
        assert r["is_dup"] == (r["doc_id"] > exp_rep)
        sizes[exp_rep] = sizes.get(exp_rep, 0) + 1
        rep_of[r["doc_id"]] = r["rep_id"]
    for r in got:
        assert r["cluster_size"] == sizes[r["rep_id"]]
    # components must be closed under the pair relation (transitivity —
    # the property the band-min mapping does not guarantee)
    for a, b in pairs:
        assert rep_of[a] == rep_of[b]
