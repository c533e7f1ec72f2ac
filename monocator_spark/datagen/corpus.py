"""Deterministic synthetic world generator (FIXTURES.md F1–F4, F6).

Everything is a pure function of (image index | host | url) via xxhash64 —
no RNG state is carried, so the pure-Python simulator and the Spark engine
can independently recompute any derived value (host assignment, outlink
targets, priorities) and agree bit-for-bit. Seed pinning lives in the hash
prefixes ("hostpick|", "o|", …), not in a global seed.

Reference analogues:
  corpus    — the crawlable web (fetch targets), input_hint shape
              (BASELINE.json:15)
  seeds     — the VisitRequest queue bootstrap (/root/reference/src/TODO.MD:56)
  host_state— robots + politeness + blacklist
              (/root/reference/src/TODO.MD:11-13,57-76)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from monocator_spark import spec
from monocator_spark.functions.hashing import xxh64_str
from monocator_spark.functions.imaging import encode, phash64, pixels_for
from monocator_spark.functions.urlnorm import canonicalize_url

MEGA_HOST_SHARE = 0.3  # skew fixture: one host owns ~30% of URLs (SURVEY §4)
_SIZES = (32, 64, 128)
_VOCAB = (
    "amber bridge cloud delta ember forest glacier harbor island juniper "
    "kestrel lantern meadow nebula orchid prairie quartz river summit thicket "
    "umber violet willow xenon yonder zephyr anchor beacon cinder drift"
).split()


def image_id_of(i: int) -> str:
    return f"img{i:010d}"


def host_of_image(image_id: str, n_hosts: int) -> str:
    """Skewed host assignment: h0.example gets ~30%, rest uniform."""
    r = spec.to_unit_interval(xxh64_str("hostpick|" + image_id))
    if r < MEGA_HOST_SHARE or n_hosts == 1:
        return "h0.example"
    j = 1 + xxh64_str("hostidx|" + image_id) % (n_hosts - 1)
    return f"h{j}.example"


def url_of_image(i: int, n_hosts: int) -> str:
    image_id = image_id_of(i)
    return f"http://{host_of_image(image_id, n_hosts)}/{image_id}"


def fmt_of_image(image_id: str) -> str:
    return "png" if spec.to_unit_interval(xxh64_str("fmt|" + image_id)) < 0.7 else "jpeg"


def dims_of_image(image_id: str) -> tuple[int, int]:
    w = _SIZES[xxh64_str("w|" + image_id) % 3]
    h = _SIZES[xxh64_str("h|" + image_id) % 3]
    return w, h


def caption_of_image(image_id: str) -> str:
    n = 5 + xxh64_str("capn|" + image_id) % 8
    return " ".join(
        _VOCAB[xxh64_str(f"cap{k}|" + image_id) % len(_VOCAB)] for k in range(n)
    )


def corpus_row(
    i: int,
    *,
    corrupt: bool = False,
    oversize: bool = False,
    tiny: bool = False,
) -> dict:
    """One corpus row. ``tiny`` pins every image to 32x32 — the
    scheduler-bound bench regime (payload streaming kept below the memory
    -bandwidth wall so scheduling scalability is what gets measured). All
    derived values (phash, caption, fmt) stay consistent: validators read
    w/h/fmt from the row, never from dims_of_image."""
    image_id = image_id_of(i)
    w, h = (32, 32) if tiny else dims_of_image(image_id)
    fmt = fmt_of_image(image_id)
    px = pixels_for(image_id, w, h)
    data = encode(px, fmt)
    # phash of the *decoded* pixels: that is what a fetcher can recompute,
    # so clean lossy rows validate OK and only genuine corruption trips 422
    from monocator_spark.functions.imaging import decode as _decode

    ph = phash64(_decode(data)[0] if fmt == "jpeg" else px)
    if corrupt:  # wrongCheckSum analogue (reference src/mock-servers.MD:20)
        ph ^= 0xFF
    if oversize:  # over-max body analogue (reference src/mock-servers.MD:1-4)
        data = data + b"\x00" * (spec.MAX_BODY_BYTES + 1)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_of_image(image_id),
        "phash": ph,
    }


def build_corpus(
    n_images: int,
    *,
    corrupt_ids: frozenset[int] = frozenset(),
    oversize_ids: frozenset[int] = frozenset(),
) -> pd.DataFrame:
    rows = [
        corpus_row(i, corrupt=i in corrupt_ids, oversize=i in oversize_ids)
        for i in range(n_images)
    ]
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype(np.int32)
    df["h"] = df["h"].astype(np.int32)
    df["phash"] = df["phash"].astype(np.int64)
    return df


# --- seeds (F2): deliberate non-canonical variants + duplicates -------------

def apply_variant(url: str, v: int) -> str:
    """Non-canonical rewrites that all canonicalize back to ``url``."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if v % 4 == 1:
        return f"{scheme}://{host.upper()}/{path}"
    if v % 4 == 2:
        return f"{scheme}://{host}:80/{path}#frag"
    if v % 4 == 3:
        return f"{scheme}://{host}/./{path}"
    return url


def build_seeds(n_seeds: int, n_images: int, n_hosts: int, dup_frac: float = 0.2) -> pd.DataFrame:
    """Seed list; last ``dup_frac`` of rows duplicate earlier targets under a
    different non-canonical variant (URL-seen fixture)."""
    n_uniq = max(1, int(n_seeds * (1 - dup_frac)))
    rows = []
    for s in range(n_seeds):
        base = s if s < n_uniq else s - n_uniq
        i = (base * 2654435761 + 12345) % n_images
        rows.append({"url": apply_variant(url_of_image(i, n_hosts), s)})
    return pd.DataFrame(rows)


# --- host_state (F3): robots, quota, blacklist ------------------------------

def robots_rules_of(host: str, n_images: int) -> list[dict]:
    """0–3 disallow prefixes + occasional longer allow carve-outs.

    Longest-prefix-wins with allow-on-tie (RFC 9309 semantics [canon]).
    """
    rules: list[dict] = []
    n_rules = xxh64_str("robn|" + host) % 4
    for k in range(n_rules):
        m = xxh64_str(f"robm{k}|" + host) % n_images
        full = image_id_of(m)
        keep = 8 + xxh64_str(f"robl{k}|" + host) % 4  # 8..11 chars of the 13
        prefix = "/" + full[:keep]
        rules.append({"allow": False, "path_prefix": prefix})
        if xxh64_str(f"roba{k}|" + host) % 2 == 0 and keep < len(full):
            rules.append({"allow": True, "path_prefix": "/" + full[: keep + 1]})
    return rules


def build_host_state(n_hosts: int, n_images: int) -> pd.DataFrame:
    rows = []
    for j in range(n_hosts):
        host = f"h{j}.example"
        rows.append(
            {
                "host": host,
                "robots_rules": robots_rules_of(host, n_images),
                "crawl_delay_ms": (0, 100, 1000)[xxh64_str("delay|" + host) % 3],
                "budget_per_epoch": (2, 4, 8)[xxh64_str("budget|" + host) % 3],
                "blacklisted": xxh64_str("bl|" + host) % 50 == 0,
            }
        )
    return pd.DataFrame(rows)


# --- outlinks (F4): pure hash formula, recomputed by both engines -----------

def outlinks_of(url_norm: str, n_images: int, n_hosts: int) -> list[str]:
    """0–3 outlinks per fetched page, hash-derived; some are non-canonical
    variants, some point to already-seen targets (dedup fixture)."""
    k = xxh64_str(spec.OUTLINK_PREFIX + url_norm) % 4
    out = []
    for t in range(k):
        i = xxh64_str(f"oT{t}|" + url_norm) % n_images
        v = xxh64_str(f"oV{t}|" + url_norm) % 4
        out.append(apply_variant(url_of_image(i, n_hosts), v))
    return out


def robots_allowed(path: str, rules: list[dict]) -> bool:
    """Longest-prefix wins; allow wins ties; default allow (RFC 9309)."""
    best: tuple[int, bool] | None = None  # (prefix_len, allow); max() wins
    for r in rules:
        p = r["path_prefix"]
        if path.startswith(p):
            cand = (len(p), bool(r["allow"]))
            if best is None or cand > best:
                best = cand
    return best[1] if best is not None else True


def write_world(
    spark,
    out_dir: str,
    *,
    n_images: int,
    n_hosts: int,
    n_seeds: int,
    corrupt_ids: frozenset[int] = frozenset(),
    oversize_ids: frozenset[int] = frozenset(),
) -> None:
    """Materialize corpus/seeds/host_state as parquet for the Spark engine."""
    from pyspark.sql.types import (
        ArrayType, BinaryType, BooleanType, IntegerType, LongType,
        StringType, StructField, StructType,
    )

    corpus_schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]
    )
    pdf = build_corpus(n_images, corrupt_ids=corrupt_ids, oversize_ids=oversize_ids)
    spark.createDataFrame(pdf, corpus_schema).repartition(8).write.mode(
        "overwrite"
    ).option("compression", "uncompressed").parquet(f"{out_dir}/corpus")

    seeds = build_seeds(n_seeds, n_images, n_hosts)
    spark.createDataFrame(seeds).write.mode("overwrite").parquet(f"{out_dir}/seeds")

    hs_schema = StructType(
        [
            StructField("host", StringType()),
            StructField(
                "robots_rules",
                ArrayType(
                    StructType(
                        [
                            StructField("allow", BooleanType()),
                            StructField("path_prefix", StringType()),
                        ]
                    )
                ),
            ),
            StructField("crawl_delay_ms", LongType()),
            StructField("budget_per_epoch", IntegerType()),
            StructField("blacklisted", BooleanType()),
        ]
    )
    hs = build_host_state(n_hosts, n_images)
    spark.createDataFrame(
        [
            (
                r.host,
                [(x["allow"], x["path_prefix"]) for x in r.robots_rules],
                int(r.crawl_delay_ms),
                int(r.budget_per_epoch),
                bool(r.blacklisted),
            )
            for r in hs.itertuples()
        ],
        hs_schema,
    ).write.mode("overwrite").parquet(f"{out_dir}/host_state")
