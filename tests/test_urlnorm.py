"""Canonicalizer edge cases (SURVEY.md §2 O2) + datagen variant round-trip."""

import pandas as pd
import pytest

from monocator_spark.datagen.corpus import apply_variant
from monocator_spark.functions.urlnorm import (
    canonicalize_series, canonicalize_url, host_of,
)

CASES = [
    ("http://Example.COM/a", "http://example.com/a"),
    ("HTTP://example.com/a", "http://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/x/../b", "http://example.com/a/b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/%41%2Fb", "http://example.com/A%2Fb"),
    ("http://example.com/%3f", "http://example.com/%3F"),
    ("http://example.com/a?q=1#f", "http://example.com/a?q=1"),
    ("  http://example.com/a ", "http://example.com/a"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize("bad", ["", "not-a-url", "http://", "//host/x", None])
def test_unparseable(bad):
    assert canonicalize_url(bad) is None


def test_variants_roundtrip():
    base = "http://h3.example/img0000000042"
    for v in range(8):
        assert canonicalize_url(apply_variant(base, v)) == base


def test_host_of():
    assert host_of("http://h3.example/img1") == "h3.example"
    assert host_of("http://h3.example:8080/x") == "h3.example:8080"


def test_series_matches_scalar():
    raws = [c[0] for c in CASES] + ["junk"]
    out = canonicalize_series(pd.Series(raws)).tolist()
    assert out == [canonicalize_url(r) for r in raws]
