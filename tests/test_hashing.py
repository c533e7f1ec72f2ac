"""XXH64 must be bit-identical to Spark's xxhash64 (seed 42, UTF-8 bytes).

Vectors below were captured from a live ``F.xxhash64`` run (Spark 4.1.2);
keeping them hardcoded makes this test Spark-free and instant.
"""

import pandas as pd

from monocator_spark.functions.hashing import xxh64_series, xxh64_str

SPARK_VECTORS = {
    "": -7444071767201028348,
    "a": -8582455328737087284,
    "abc": 1423657621850124518,
    "http://h1.example/img0000000001": -5153794260674440291,
    "x" * 31: -1716462135722163746,   # < one 32-byte stripe
    "y" * 32: 5202031258905353636,    # exactly one stripe
    "z" * 100: -5456014878706197617,  # stripes + tail
    "héllo wörld ☃": 6886605780980093317,  # multi-byte UTF-8
}


def test_matches_spark_vectors():
    for s, expected in SPARK_VECTORS.items():
        assert xxh64_str(s) == expected, s


def test_series_matches_scalar():
    keys = list(SPARK_VECTORS)
    out = xxh64_series(pd.Series(keys))
    assert out.tolist() == [SPARK_VECTORS[k] for k in keys]


def test_signed_range():
    for s in SPARK_VECTORS:
        v = xxh64_str(s)
        assert -(1 << 63) <= v < (1 << 63)
