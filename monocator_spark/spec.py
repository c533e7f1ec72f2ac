"""Crawl spec — the single source of truth shared by the pure-Python
reference simulator (`monocator_spark.sim`) and the Spark engine
(`monocator_spark.plans.epoch`).

The reference repo (`/root/reference`, maartenbosteels/monocator) ships only
design docs; where they are silent the rules below follow the published
Mercator crawler canon (Heydon & Najork, WWW 1999) and RFC 9309 robots
semantics, marked [canon] in SURVEY.md §0.4. Every constant and formula here
is deterministic: no wall clock, no RNG at crawl time.

Key invariants (BASELINE.json north_rule):
  * url_hash      = xxhash64(url_norm)                 (Spark builtin seed 42)
  * priority      = uniform in [0,1) derived from xxhash64("p|" + url_norm)
  * wave order    = (priority DESC, url_hash ASC)      — total order, no ties
  * politeness    = per-host quota per epoch (budget), robots longest-match
  * url-seen      = canonical-URL dedup; first enqueue wins
"""

from __future__ import annotations

# ---- frontier / wave ------------------------------------------------------
WAVE_SIZE = 1000          # max URLs fetched per epoch (global cap)
PER_HOST_QUOTA = 8        # max URLs per host per epoch [canon: Mercator politeness]
MAX_DEPTH = 3             # outlink expansion depth cap (web.max_pages analogue,
                          # reference src/TODO.MD:61)
MAX_RETRIES = 2           # failed fetch re-enqueue cap (erroring-page analogue,
                          # reference src/mock-servers.MD:22)

# ---- dedup ----------------------------------------------------------------
BLOOM_SHARDS = 32         # power of two; shard = url_hash & (BLOOM_SHARDS-1)
BLOOM_BITS_PER_SHARD = 1 << 20   # 128 KiB/shard locally; sized up at scale
BLOOM_NUM_HASHES = 7

# ---- skew -----------------------------------------------------------------
HOST_BUCKETS = 64         # salted buckets for window ranking (north_star:
                          # "salted window-ranked DataFrame batches")
SALT_PER_HOST = 4         # a mega-host is spread over SALT_PER_HOST buckets

# ---- fetch payload --------------------------------------------------------
MAX_BODY_BYTES = 1 << 20  # max-body enforcement (PageFetcherTest analogue,
                          # reference src/mock-servers.MD:1-4)
PSNR_MIN_DB = 40.0        # lossy-format decode invariant (BASELINE.json:15)

# ---- priority / hashing derivations ---------------------------------------
PRIORITY_PREFIX = "p|"    # priority = to_unit(xxhash64(PRIORITY_PREFIX + url_norm))
OUTLINK_PREFIX = "o|"     # outlink fan-out derived from xxhash64(OUTLINK_PREFIX + url_norm)


def to_unit_interval(h: int) -> float:
    """Map a signed 64-bit hash to a double in [0, 1).

    Both sides divide the signed value by exactly 2^64 (a power of two, so
    exactly representable as a double) and shift by 0.5 — bit-identical IEEE
    double arithmetic in either engine.
    """
    return h / 18446744073709551616.0 + 0.5


# Spark SQL fragment computing the same priority (keep in sync with above).
# 2^64 is written as an integer literal and cast, so it parses to exactly 2^64.
PRIORITY_SQL = (
    "(CAST(xxhash64(concat('{pfx}', {col})) AS DOUBLE)"
    " / CAST(18446744073709551616 AS DOUBLE)) + 0.5"
)


def priority_sql(col: str) -> str:
    return PRIORITY_SQL.format(pfx=PRIORITY_PREFIX, col=col)


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class CrawlConfig:
    """One config object shared verbatim by the Spark engine, the reference
    simulator, and the bench harness — identical rules at every scale."""

    n_images: int
    n_hosts: int
    wave_size: int = WAVE_SIZE
    per_host_quota: int = PER_HOST_QUOTA
    max_depth: int = MAX_DEPTH
    max_retries: int = MAX_RETRIES
    max_body_bytes: int = MAX_BODY_BYTES
    psnr_min_db: float = PSNR_MIN_DB
    bloom_shards: int = BLOOM_SHARDS
    bloom_bits_per_shard: int = BLOOM_BITS_PER_SHARD
    bloom_num_hashes: int = BLOOM_NUM_HASHES
    salt_per_host: int = SALT_PER_HOST
    follow_outlinks: bool = True
