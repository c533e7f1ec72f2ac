"""Scan module — O8 DNS resolve, O12 TLS fan-out, O13 IP-level scan cache.

Reference semantics reproduced (SURVEY.md §2.1):
  * O8  — hostname → IP before any scan (`dns.enabled/prefixes/rrtypes`,
    /root/reference/src/TODO.MD:57-59). No network exists in the sandbox, so
    the resolve is the deterministic hash-derived mapping pinned in
    ``spec.ip_of_host`` [canon]; the IP space is smaller than the host space
    so co-hosted hosts genuinely share IPs.
  * O12 — per-host TLS scan fans out over the enabled protocol versions and
    re-aggregates into the reference's central result type
    ``Map<TlsProtocolVersion, SingleVersionScan>`` + ``connectOK``
    (/root/reference/src/TODO.MD:27-28, toggles TODO.MD:70-75): here
    ``explode`` → per-(ip, version) outcome → ``map_from_entries(
    sort_array(collect_list(struct(...))))`` + ``bool_or``.
  * O13 — scans are cached per IP (`fullScanCache.find(ip)`,
    /root/reference/src/TODO.MD:41): an anti-join against the persistent
    ``scan_cache`` table picks only never-scanned IPs for the fan-out; every
    wave host then equi-joins the (cache ∪ fresh) results, so two hosts on
    one IP share a single scan.

Everything is pure Catalyst — no UDFs: xxhash64/pmod reproduce the shared
spec functions bit-for-bit (the pure-Python simulator recomputes them via
``spec.tls_versions_of_ip`` / ``spec.tls_scan_of``).

Scale shape: the fan-out side is bounded by |distinct wave IPs| ≤ wave_size;
the scan_cache table is O(IPs seen) and is touched only by (a) one anti-join
probed by the bounded wave side and (b) one equi-join built from the bounded
side — the cache is never shuffled wholesale. At 10^10-frontier scale the
cache would be bucketed by ip (same layout as the corpus table) so both
joins prune to the wave's buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from monocator_spark import spec

# columns of the persistent scan_cache table (state) and per-visit tls table
CACHE_COLS = ["ip", "scan", "connect_ok", "n_versions"]
TLS_COLS = ["host", "ip", "scan", "connect_ok", "cache_hit", "epoch"]


def ip_col(host_col: str, n_hosts: int) -> F.Column:
    """O8: deterministic DNS resolve — pmod(xxhash64('ip|'||host), n_ips).

    Matches ``spec.ip_of_host`` exactly (Python %% on a signed hash == pmod).
    """
    return F.pmod(
        F.xxhash64(F.concat(F.lit(spec.IP_PREFIX), F.col(host_col))),
        F.lit(spec.n_ips_for(n_hosts)),
    )


def resolve_hosts(hosts: DataFrame, n_hosts: int, host_col: str = "host") -> DataFrame:
    """Attach the resolved ``ip`` column to a host DataFrame."""
    return hosts.withColumn("ip", ip_col(host_col, n_hosts))


def tls_scan_ips(ips: DataFrame) -> DataFrame:
    """O12 fan-out: ips(ip) → (ip, scan map, connect_ok, n_versions).

    Every IP yields exactly one row — an IP with zero enabled versions gets
    an empty map and connect_ok = false (it still must enter the cache, or
    it would be rescanned every epoch).
    """
    ver = F.explode(F.array(*[F.lit(v) for v in spec.TLS_VERSIONS])).alias("version")
    fanned = ips.select("ip", ver)
    cfg_h = F.pmod(
        F.xxhash64(
            F.concat(F.lit(spec.TLS_CFG_PREFIX), F.col("ip").cast("string"),
                     F.lit("|"), F.col("version"))
        ),
        F.lit(2),
    )
    hv = F.pmod(
        F.xxhash64(
            F.concat(F.lit(spec.TLS_SCAN_PREFIX), F.col("ip").cast("string"),
                     F.lit("|"), F.col("version"))
        ),
        F.lit(20),
    )
    scanned = (
        fanned.where(cfg_h == 0)  # per-version enabled toggle (TODO.MD:70-75)
        .withColumn("hv", hv)
        .withColumn("connect_ok", F.col("hv") != 0)
        .withColumn(
            "cipher",
            F.concat(F.col("version"), F.lit("-c"), (F.col("hv") % 4).cast("string")),
        )
        .groupBy("ip")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("version"),
                            F.struct("connect_ok", "cipher").alias("result"),
                        )
                    )
                )
            ).alias("scan"),
            F.bool_or("connect_ok").alias("connect_ok"),
            F.count(F.lit(1)).cast("int").alias("n_versions"),
        )
    )
    empty_map = F.expr(
        "map_from_entries(cast(array() as"
        " array<struct<version:string,result:struct<connect_ok:boolean,cipher:string>>>))"
    )
    return (
        ips.join(scanned, "ip", "left")
        .withColumn("scan", F.coalesce("scan", empty_map))
        .withColumn("connect_ok", F.coalesce("connect_ok", F.lit(False)))
        .withColumn("n_versions", F.coalesce("n_versions", F.lit(0)))
        .select(*CACHE_COLS)
    )


def scan_wave(
    wave_hosts: DataFrame, cache: DataFrame | None, epoch: int,
    cfg: spec.CrawlConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """O13: (wave_hosts(host, ip), cache) → (tls_rows, new_cache_rows).

    ``cache_hit`` is defined as "IP was in the cache before this epoch" —
    order-free, so two co-hosted hosts discovered in the same wave both
    count as misses but still share the single fresh scan.

    The wave-IP probe side broadcasts only below cfg.wave_broadcast_max
    (operators/hints.wave_side): a full-scale wave's distinct-IP set can be
    10^7–10^8 rows, which must take the shuffle join against the cache.
    """
    from monocator_spark.operators.hints import wave_side

    def _ws(df: DataFrame) -> DataFrame:
        return wave_side(df, cfg) if cfg is not None else F.broadcast(df)

    wave_ips = wave_hosts.select("ip").distinct()
    if cache is None:
        new_ips = wave_ips
        cached_part = None
    else:
        new_ips = wave_ips.join(cache.select("ip"), "ip", "left_anti")
        cached_part = cache.join(_ws(wave_ips), "ip", "inner").select(
            "ip", "scan", "connect_ok", F.lit(True).alias("cache_hit")
        )
    fresh = tls_scan_ips(new_ips)
    fresh_part = fresh.select("ip", "scan", "connect_ok", F.lit(False).alias("cache_hit"))
    all_scans = (
        fresh_part if cached_part is None else cached_part.unionByName(fresh_part)
    )
    tls_rows = (
        wave_hosts.join(all_scans, "ip", "inner")
        .withColumn("epoch", F.lit(epoch))
        .select(*TLS_COLS)
    )
    return tls_rows, fresh
