"""Robots longest-prefix semantics (RFC 9309 [canon]) — the pure-Python rule
the Catalyst expression in operators/politeness.py must mirror (the e2e test
checks both sides agree end-to-end)."""

from monocator_spark.datagen.corpus import robots_allowed


def test_default_allow():
    assert robots_allowed("/anything", [])


def test_simple_disallow():
    rules = [{"allow": False, "path_prefix": "/img00000"}]
    assert not robots_allowed("/img000001234", rules)
    assert robots_allowed("/img100001234", rules)


def test_longest_match_wins():
    rules = [
        {"allow": False, "path_prefix": "/img00000"},
        {"allow": True, "path_prefix": "/img000001"},
    ]
    assert robots_allowed("/img0000012345", rules)   # longer allow wins
    assert not robots_allowed("/img0000098765", rules)


def test_allow_wins_tie():
    rules = [
        {"allow": False, "path_prefix": "/img0"},
        {"allow": True, "path_prefix": "/img1"[:5].replace("1", "0")},  # same prefix
    ]
    assert robots_allowed("/img0X", rules)


def test_order_independent():
    rules = [
        {"allow": True, "path_prefix": "/a/b"},
        {"allow": False, "path_prefix": "/a"},
    ]
    assert robots_allowed("/a/b/c", rules)
    assert not robots_allowed("/a/x", rules)
    assert robots_allowed("/a/x", list(reversed(rules))) is robots_allowed("/a/x", rules)
