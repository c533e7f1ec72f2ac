"""SimHash near-dup LSH (queries/textops.py simhash_hamming_pairs /
simhash_dedup_groups): the banded-LSH candidate join must be EXACT — at
Hamming <= _SH_THRESHOLD with _SH_BANDS > _SH_THRESHOLD bands, every true
pair shares at least one intact band (pigeonhole), so output ≡ the naive
quadratic join. Pinned here against a brute-force cross join at sf0.001;
the DuckDB oracle covers sf0.01 via the driver gate.
"""

from pyspark.sql import functions as F

from monocator_spark.queries.textops import (
    _SH_BANDS,
    _SH_THRESHOLD,
    q_simhash_docs,
    q_simhash_dedup_groups,
    q_simhash_hamming_pairs,
)

SF = "/root/testdata/sf0.001"


def test_pigeonhole_condition():
    # the exactness proof needs threshold < bands; keep the constants honest
    assert _SH_THRESHOLD < _SH_BANDS


def test_pairs_match_bruteforce(spark):
    sh = q_simhash_docs(spark, SF).cache()
    a, b = sh.alias("a"), sh.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= _SH_THRESHOLD)
    )
    got = {tuple(r) for r in q_simhash_hamming_pairs(spark, SF).collect()}
    exp = {tuple(r) for r in brute.collect()}
    sh.unpersist()
    assert got == exp
    assert len(exp) > 0  # the synthetic corpus must actually exercise it


def test_groups_shape_and_consistency(spark):
    groups = q_simhash_dedup_groups(spark, SF).collect()
    n_docs = q_simhash_docs(spark, SF).count()
    # O(docs) output: exactly one row per doc
    assert len(groups) == n_docs
    by_id = {r["doc_id"]: r for r in groups}
    for r in groups:
        # a representative is never a dup, and reps point at themselves
        assert r["rep_id"] <= r["doc_id"]
        assert r["is_dup"] == (r["doc_id"] > r["rep_id"])
        assert by_id[r["rep_id"]]["rep_id"] <= r["rep_id"]
