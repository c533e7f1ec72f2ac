"""Bloom shard math: zero false negatives, bounded false positives,
associative OR-merge (SURVEY.md §5.2 item 3)."""

import numpy as np

from monocator_spark import spec
from monocator_spark.operators.dedup import bits_from_hashes, probe_hashes

CFG = spec.CrawlConfig(n_images=1, n_hosts=1)


def _hashes(n, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(-(1 << 63), 1 << 63, size=n, dtype=np.int64)


def test_no_false_negatives():
    ins = _hashes(50_000, 1)
    bits = bits_from_hashes(ins, CFG)
    assert probe_hashes(ins, bits, CFG).all()


def test_false_positive_rate_bounded():
    ins = _hashes(50_000, 2)
    probe = _hashes(100_000, 3)
    bits = bits_from_hashes(ins, CFG)
    fp = probe_hashes(probe, bits, CFG).mean()
    # m=2^20 bits, n=50k, k=7 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 0.2%
    assert fp < 0.01, fp


def test_or_merge_associative_commutative():
    a = bits_from_hashes(_hashes(1000, 4), CFG)
    b = bits_from_hashes(_hashes(1000, 5), CFG)
    na, nb = np.frombuffer(a, dtype=np.uint8), np.frombuffer(b, dtype=np.uint8)
    assert bytes(na | nb) == bytes(nb | na)
    both = bits_from_hashes(np.concatenate([_hashes(1000, 4), _hashes(1000, 5)]), CFG)
    assert bytes(na | nb) == both


def test_empty_build():
    bits = bits_from_hashes(np.array([], dtype=np.int64), CFG)
    assert not probe_hashes(_hashes(100, 6), bits, CFG).any()
