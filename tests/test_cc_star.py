"""Large-star/small-star connected components (dedup_cc_largestar).

Pins the two properties the min-label-propagation twin can't show:
1. identical labels on an adversarial long-chain graph — the worst case
   for propagation — while converging in O(log n) rounds instead of
   O(n) (the round counts of both algorithms are asserted);
2. identical full-op output on the driver testdata (near-clique LSH
   duplicate families) vs q_dedup_connected_components.
"""
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"

_CHAIN_N = 24


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    return df.unionByName(df.selectExpr("dst as src", "src as dst"))


def test_chain_logn_rounds(spark):
    from monocator_spark.queries.textops import (
        _connected_components,
        _connected_components_star,
    )

    # path graph 0-1-...-23 plus a disjoint triangle and an isolated edge
    pairs = [(i, i + 1) for i in range(_CHAIN_N - 1)] + [
        (40, 41), (41, 42), (40, 42), (50, 51),
    ]
    edges = _sym(spark, pairs)
    expected = {
        **{i: 0 for i in range(_CHAIN_N)},
        40: 40, 41: 40, 42: 40,
        50: 50, 51: 50,
    }

    star_labels, star_rounds = _connected_components_star(edges, spark)
    got_star = {r["node"]: r["lbl"] for r in star_labels.collect()}
    assert got_star == expected

    prop_rounds: list = []
    prop_labels = _connected_components(edges, spark, rounds_out=prop_rounds)
    got_prop = {r["node"]: r["lbl"] for r in prop_labels.collect()}
    assert got_prop == expected

    # propagation moves the min one hop per round: rounds ≈ chain length;
    # the star alternation contracts in O(log n)
    assert prop_rounds[0] >= _CHAIN_N - 2
    assert star_rounds <= 2 * math.ceil(math.log2(_CHAIN_N)) + 2
    assert star_rounds < prop_rounds[0]


def test_exhaustion_falls_back_to_propagation(spark, caplog):
    """ADVICE-r4 guard: when the alternation cannot prove a star (here:
    max_rounds too small for the chain), the op must NOT return the
    intermediate non-star edge set — it logs and falls back to min-label
    propagation, so the labels are still exact and one-row-per-node."""
    import logging

    from monocator_spark.queries.textops import _connected_components_star

    pairs = [(i, i + 1) for i in range(_CHAIN_N - 1)] + [(50, 51)]
    edges = _sym(spark, pairs)
    expected = {**{i: 0 for i in range(_CHAIN_N)}, 50: 50, 51: 50}

    with caplog.at_level(logging.WARNING):
        labels, _rounds = _connected_components_star(edges, spark, max_rounds=1)
    got = [(r["node"], r["lbl"]) for r in labels.collect()]
    assert dict(got) == expected
    assert len(got) == len(expected)  # exactly one label row per node
    assert any("falling back" in rec.message for rec in caplog.records)


def test_star_matches_propagation_on_testdata(spark):
    from monocator_spark.queries.textops import (
        q_dedup_cc_largestar,
        q_dedup_connected_components,
    )

    a = {
        r["doc_id"]: (r["rep_id"], r["is_dup"], r["cluster_size"])
        for r in q_dedup_connected_components(spark, SF_DIR).collect()
    }
    b = {
        r["doc_id"]: (r["rep_id"], r["is_dup"], r["cluster_size"])
        for r in q_dedup_cc_largestar(spark, SF_DIR).collect()
    }
    assert a == b
