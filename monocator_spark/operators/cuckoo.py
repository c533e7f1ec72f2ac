"""URL-seen dedup, cuckoo-filter variant (SURVEY.md §2 O4).

The north rule names the URL-seen structure as "bloom/cuckoo"
(BASELINE.json north_rule; north_star: "partitioned Bloom/cuckoo-filter
URL-seen set"). ``operators/dedup.py`` ships the Bloom default; this module
is the cuckoo twin behind ``cfg.seen_filter = "cuckoo"`` — same sharding
(shard = url_hash & (S-1)), same pre-filter contract (no false negatives;
"maybe seen" rows take the exact confirm join), same state-table shape
(shard, bits, n_inserted [, overflowed]).

Partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNLL 2014 — public algorithm): each key stores a 16-bit
nonzero fingerprint in one of two candidate buckets, ``b1 = H(h) & (B-1)``
and ``b2 = b1 ^ (H'(fp) & (B-1))`` — an involution, so a stored slot's
alternate is recoverable from (bucket, fp) alone, which is what makes
eviction and table MERGE possible without the original keys. 4 slots per
bucket → ~95% fill capacity; ``spec.cuckoo_buckets_for`` sizes to ≤80%
load.

Two properties the Bloom twin gets for free need explicit care here:

* **Determinism** — a cuckoo table's layout depends on insertion order, so
  ``build_shards`` sorts each shard's hashes first and the eviction victim
  is a pure function of the kick count: the persisted filter bytes are a
  function of the key SET, byte-identical at every parallelism level (the
  same guarantee the Bloom OR gives structurally).
* **No false negatives under overflow** — a full table would drop a
  fingerprint, and a dropped key would skip the exact confirm and corrupt
  the crawl. Overflow therefore sets a per-shard ``overflowed`` flag that
  forces every probe in that shard to "maybe seen" (the shard degrades to
  the exact join, output unchanged). Proper sizing makes this unreachable;
  the flag makes it safe anyway.

Merge is a deterministic REBUILD: occupied (bucket, fp) slots from all
input tables are re-inserted in sorted order. Unlike the Bloom OR it is not
slot-stable across different merge histories, but the engine's state
evolution (bootstrap build + one delta merge per epoch) is a fixed sequence,
so resumed and fresh runs see identical bytes.

Why ship both: the Bloom filter is smaller per element at the ~0.1% FP
target and merges by a trivial OR; the cuckoo filter supports DELETION
(drop a fingerprint when a URL's TTL expires — the recrawl/eviction story a
long-lived frontier needs) and keeps lookups at exactly two cache lines.
``delete_hashes`` implements that eviction path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, IntegerType, LongType, StructField, StructType,
)

from monocator_spark import spec
from monocator_spark.operators.dedup import shard_col

CUCKOO_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("bits", BinaryType()),  # uint16[buckets*4] slot array
        StructField("n_inserted", LongType()),
        StructField("overflowed", BooleanType()),
    ]
)

SLOTS_PER_BUCKET = 4
MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """uint16 nonzero fingerprints — a second, independent mix of url_hash
    (the primary bucket uses the raw low bits, so fp must not be them)."""
    h = hashes.astype(np.uint64)
    h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return (h % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _bucket1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    h = hashes.astype(np.uint64)
    h = (h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(13)
    return (h & np.uint64(n_buckets - 1)).astype(np.int64)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """b ^ (H'(fp) & (B-1)) — self-inverse, so alt(alt(b)) == b."""
    hf = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
    hf ^= hf >> np.uint64(7)
    return (bucket.astype(np.uint64) ^ (hf & np.uint64(n_buckets - 1))).astype(
        np.int64
    )


def _insert_pairs(
    tbl: np.ndarray, buckets: np.ndarray, fps: np.ndarray
) -> bool:
    """Insert (bucket, fp) pairs into tbl[(B, 4)] in the given order.
    Returns True iff any insertion overflowed (its fp was dropped)."""
    n_buckets = tbl.shape[0]
    overflow = False
    for j in range(len(fps)):
        fp = np.uint16(fps[j])
        b = int(buckets[j])
        placed = False
        for cand in (b, int(_alt_bucket(np.array([b]), np.array([fp]), n_buckets)[0])):
            row = tbl[cand]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                placed = True
                break
        if placed:
            continue
        # eviction loop: kick a victim (slot chosen by kick count — pure
        # function of the loop, no RNG) and move it to ITS alternate
        cur_b, cur_fp = b, fp
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS_PER_BUCKET
            victim = tbl[cur_b, slot]
            tbl[cur_b, slot] = cur_fp
            cur_fp = victim
            cur_b = int(
                _alt_bucket(
                    np.array([cur_b]), np.array([np.uint16(cur_fp)]), n_buckets
                )[0]
            )
            row = tbl[cur_b]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = cur_fp
                placed = True
                break
        if not placed:
            overflow = True  # cur_fp dropped — the shard flag covers it
    return overflow


def build_shards(new_hashes: DataFrame, cfg: spec.CrawlConfig) -> DataFrame:
    """new_hashes(url_hash) → (shard, bits, n_inserted, overflowed)."""
    n_buckets = cfg.cuckoo_buckets_per_shard

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h = np.sort(pdf["url_hash"].to_numpy(dtype=np.int64))  # determinism
        tbl = np.zeros((n_buckets, SLOTS_PER_BUCKET), dtype=np.uint16)
        fps = _fingerprints(h)
        b1 = _bucket1(h, n_buckets)
        overflow = _insert_pairs(tbl, b1, fps)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bits": [tbl.tobytes()],
                "n_inserted": [len(h)],
                "overflowed": [overflow],
            }
        )

    return (
        new_hashes.withColumn("shard", shard_col("url_hash", cfg))
        .groupBy("shard")
        .applyInPandas(build, CUCKOO_SCHEMA)
    )


def _occupied(tbl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, fp) of every occupied slot — order-free content view."""
    bk, _slot = np.nonzero(tbl)
    return bk.astype(np.int64), tbl[tbl != 0]


def merge_shards(
    existing: DataFrame | None, delta: DataFrame, cfg: spec.CrawlConfig
) -> DataFrame:
    """Per-shard deterministic rebuild from all inputs' occupied slots.

    A slot's candidate-bucket pair is recoverable from (bucket, fp) — the
    partial-key property — so re-insertion needs no original keys. Slots
    are re-inserted sorted by (bucket, fp): merge output is a pure function
    of the input tables' CONTENT, independent of row arrival order."""
    both = delta if existing is None else existing.unionByName(delta)
    n_buckets = cfg.cuckoo_buckets_per_shard

    def orm(pdf: pd.DataFrame) -> pd.DataFrame:
        bks, fps = [], []
        overflow = bool(pdf["overflowed"].any())
        for b in pdf["bits"]:
            t = np.frombuffer(b, dtype=np.uint16).reshape(
                n_buckets, SLOTS_PER_BUCKET
            )
            bk, fp = _occupied(t)
            bks.append(bk)
            fps.append(fp)
        bk = np.concatenate(bks) if bks else np.empty(0, dtype=np.int64)
        fp = np.concatenate(fps) if fps else np.empty(0, dtype=np.uint16)
        order = np.lexsort((fp, bk))
        tbl = np.zeros((n_buckets, SLOTS_PER_BUCKET), dtype=np.uint16)
        overflow |= _insert_pairs(tbl, bk[order], fp[order])
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bits": [tbl.tobytes()],
                "n_inserted": [int(pdf["n_inserted"].sum())],
                "overflowed": [overflow],
            }
        )

    return both.groupBy("shard").applyInPandas(orm, CUCKOO_SCHEMA)


def probe_hashes(
    hashes: np.ndarray, bits: bytes, overflowed: bool, cfg: spec.CrawlConfig
) -> np.ndarray:
    """→ bool[n]: True = maybe seen. An overflowed shard answers all-True
    (no false negatives, the shard degrades to the exact confirm join)."""
    if overflowed:
        return np.ones(len(hashes), dtype=bool)
    n_buckets = cfg.cuckoo_buckets_per_shard
    tbl = np.frombuffer(bits, dtype=np.uint16).reshape(n_buckets, SLOTS_PER_BUCKET)
    fp = _fingerprints(hashes)
    b1 = _bucket1(hashes, n_buckets)
    b2 = _alt_bucket(b1, fp, n_buckets)
    return ((tbl[b1] == fp[:, None]) | (tbl[b2] == fp[:, None])).any(axis=1)


def delete_hashes(filt: DataFrame, gone: DataFrame, cfg: spec.CrawlConfig) -> DataFrame:
    """Remove fingerprints for ``gone(url_hash)`` rows — the eviction path
    Bloom structurally cannot offer (TTL expiry / forced-recrawl forget).

    Contract (standard cuckoo-filter deletion): only delete keys that WERE
    inserted, one deletion per insertion — deleting a never-inserted key
    may evict another key's colliding fingerprint. One slot is cleared per
    (bucket, fp) occurrence, slots scanned in fixed order → deterministic."""
    n_buckets = cfg.cuckoo_buckets_per_shard
    gone = gone.withColumn("shard", shard_col("url_hash", cfg))

    def drop(filt_pdf: pd.DataFrame, gone_pdf: pd.DataFrame) -> pd.DataFrame:
        if filt_pdf.empty:
            return filt_pdf
        out = filt_pdf.iloc[:1].copy()
        if gone_pdf.empty:
            return out
        tbl = np.frombuffer(out["bits"].iloc[0], dtype=np.uint16).reshape(
            n_buckets, SLOTS_PER_BUCKET
        ).copy()
        h = np.sort(gone_pdf["url_hash"].to_numpy(dtype=np.int64))
        fps = _fingerprints(h)
        b1s = _bucket1(h, n_buckets)
        b2s = _alt_bucket(b1s, fps, n_buckets)
        removed = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            for cand in (int(b1), int(b2)):
                hit = np.nonzero(tbl[cand] == fp)[0]
                if hit.size:
                    tbl[cand, hit[0]] = 0
                    removed += 1
                    break
        out["bits"] = [tbl.tobytes()]
        out["n_inserted"] = [max(0, int(out["n_inserted"].iloc[0]) - removed)]
        return out

    return (
        filt.groupBy("shard")
        .cogroup(gone.groupBy("shard"))
        .applyInPandas(drop, CUCKOO_SCHEMA)
    )


def _broadcast_probe(
    cands: DataFrame, shards: list, cfg: spec.CrawlConfig
) -> DataFrame:
    """Probe via a scalar pandas UDF over the (shard, bucket, slot) tensor
    captured in the closure — vectorized, no shuffle (the small-filter
    fast path, mirroring dedup._broadcast_probe)."""
    n_buckets, n_shards = cfg.cuckoo_buckets_per_shard, cfg.bloom_shards
    mat = np.zeros((n_shards, n_buckets, SLOTS_PER_BUCKET), dtype=np.uint16)
    over = np.zeros(n_shards, dtype=bool)
    for r in shards:
        mat[int(r["shard"])] = np.frombuffer(r["bits"], dtype=np.uint16).reshape(
            n_buckets, SLOTS_PER_BUCKET
        )
        over[int(r["shard"])] = bool(r["overflowed"])

    def probe(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy(dtype=np.int64)
        shard = (h & (n_shards - 1)).astype(np.int64)
        fp = _fingerprints(h)
        b1 = _bucket1(h, n_buckets)
        b2 = _alt_bucket(b1, fp, n_buckets)
        got = (
            (mat[shard, b1] == fp[:, None]) | (mat[shard, b2] == fp[:, None])
        ).any(axis=1)
        return pd.Series(got | over[shard])

    return cands.withColumn(
        "maybe_seen", F.pandas_udf(probe, BooleanType())("url_hash")
    )


def prefilter(
    cands: DataFrame, filt: DataFrame | None, cfg: spec.CrawlConfig
) -> DataFrame:
    """Tag candidates with maybe_seen — the cuckoo mirror of
    dedup.bloom_prefilter, same broadcast-vs-cogroup size switch."""
    from monocator_spark.operators.dedup import BROADCAST_PROBE_MAX_BYTES

    if filt is None:
        return cands.withColumn("maybe_seen", F.lit(True))

    total = cfg.bloom_shards * cfg.cuckoo_buckets_per_shard * SLOTS_PER_BUCKET * 2
    if total <= BROADCAST_PROBE_MAX_BYTES:
        return _broadcast_probe(cands, filt.collect(), cfg)

    out_schema = StructType(
        list(cands.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )
    cand_cols = list(cands.columns)

    def probe(cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        if filt_pdf.empty:
            maybe = np.zeros(len(h), dtype=bool)
        else:
            maybe = probe_hashes(
                h, filt_pdf["bits"].iloc[0], bool(filt_pdf["overflowed"].iloc[0]), cfg
            )
        out = cand_pdf[cand_cols].copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cands.withColumn("shard", shard_col("url_hash", cfg))
        .groupBy("shard")
        .cogroup(filt.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )
