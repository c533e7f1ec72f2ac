"""64-bit URL fingerprinting — pure-Python XXH64 matching Spark's ``xxhash64``.

The crawl spec (SURVEY.md §2 O3) pins the URL fingerprint to XXH64 with
Spark's default seed 42, so the Spark engine can use the JVM-side builtin
``F.xxhash64(col)`` (zero Python in the hot path) while the pure-Python
reference simulator (SURVEY.md §5.2) computes bit-identical hashes.

Reference analogue: Mercator-style URL-seen fingerprints [canon]; the
reference repo's IP-level cache key (`/root/reference/src/TODO.MD:41`).

Note on Spark semantics: ``xxhash64`` over a STRING column hashes the UTF-8
bytes with seed 42 and returns a *signed* 64-bit long.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _PRIME2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _PRIME1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    acc = (acc * _PRIME1 + _PRIME4) & _MASK
    return acc


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data``; returns the *signed* 64-bit value Spark returns."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _PRIME1) & _MASK
        while idx <= n - 32:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + n) & _MASK
    while idx <= n - 8:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _PRIME1 + _PRIME4) & _MASK
        idx += 8
    if idx <= n - 4:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _PRIME1) & _MASK
        h = (_rotl(h, 23) * _PRIME2 + _PRIME3) & _MASK
        idx += 4
    while idx < n:
        h ^= (data[idx] * _PRIME5) & _MASK
        h = (_rotl(h, 11) * _PRIME1) & _MASK
        idx += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    # two's-complement → signed, matching Spark's LongType
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed XXH64 of a string's UTF-8 bytes — equals ``F.xxhash64(col)``."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_series(s: pd.Series, seed: int = SPARK_XXHASH_SEED) -> pd.Series:
    """Vectorized (per-batch) XXH64 over a pandas string Series → int64."""
    return pd.Series(
        np.fromiter((xxh64(v.encode("utf-8"), seed) for v in s), dtype=np.int64, count=len(s)),
        index=s.index,
    )
