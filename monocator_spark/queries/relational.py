"""Relational crawl-surface operators over the driver testdata (SURVEY.md §2.2).

Each query is the driver-checkable analogue of a crawl operator, named in the
comments. Money/value sums use exact integer cents (cast(round(x*100) as
bigint)) so Spark's and DuckDB's float summation order can't diverge; double
outputs are only ever produced by identical-operand divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_CENTS = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731


# -- O1/O7: wave selection = per-key top-k by total order ---------------------
def q_wave_select_rank(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


SQL_WAVE = """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) t
WHERE rn <= 3
"""


# -- O7: politeness quota = first-k per host by time --------------------------
def q_politeness_quota(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_CENTS("value")).alias("sum_value_cents"),
        )
    )


SQL_QUOTA = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) t
WHERE rn <= 5 GROUP BY event_type
"""


# -- O4: URL-seen dedup = left-anti join --------------------------------------
def q_dedup_anti_join(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# -- O13: scan-cache hit detection = left-semi join ---------------------------
def q_cache_semi_join(spark, sf_dir):
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    return s.join(
        c, s.s_nationkey == c.c_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


SQL_SEMI = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey)
"""


# -- O5/O9: broadcast dim join + agg ------------------------------------------
def q_broadcast_join_agg(spark, sf_dir):
    o = T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_CENTS("o_totalprice")).alias("revenue_cents"),
        )
    )


SQL_BCAST = """
SELECT n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'O' GROUP BY n_name
"""


# -- O17: lineage/metrics rollup (TPC-H Q1 shape) -----------------------------
def q_lineage_rollup(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_CENTS("l_extendedprice")).alias("sum_price_cents"),
    )
    return agg.withColumn(
        "avg_qty", F.round(F.col("sum_qty") / F.col("n"), 6)
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus, n, sum_qty, sum_price_cents,
       ROUND(CAST(sum_qty AS DOUBLE) / n, 6) AS avg_qty
FROM (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
  GROUP BY l_returnflag, l_linestatus) t
"""


# -- O17: grouping-sets rollup -------------------------------------------------
def q_rollup_groupsets(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# -- O1: global wave cut = total-order sort + limit ---------------------------
def q_topk_global(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


SQL_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# -- O7: politeness time window = equi + range join ---------------------------
def q_range_join_window(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_RANGE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
"""


# -- tests §5.2: seen-set diff = set EXCEPT ------------------------------------
def q_set_except(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f.exceptAll(op)


SQL_EXCEPT = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


# -- O2-adjacent: JSON props extraction ----------------------------------------
def q_json_extract_agg(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k_bucket", F.pmod(k, F.lit(10)))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS("value")).alias("sum_value_cents"),
        )
    )


SQL_JSON = """
SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


# -- O3/O4: deterministic hash sharding (md5 — shared with DuckDB) -------------
def q_md5_shard(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    shard = F.expr("cast(conv(substr(md5(text),1,4),16,10) as bigint) % 16")
    return d.groupBy(shard.alias("shard")).agg(F.count(F.lit(1)).alias("n_docs"))


SQL_SHARD = """
SELECT CAST(('0x'||substr(md5(text),1,4)) AS BIGINT) % 16 AS shard,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""


# -- O14: screenshot policy = CASE WHEN chain ----------------------------------
def q_case_when_policy(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    policy = (
        F.when(F.col("value") < 10, "never")
        .when(F.col("value") < 50, "if_changed")
        .otherwise("always")
    )
    return (
        e.withColumn("policy", policy)
        .groupBy("event_type", "policy")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_POLICY = """
SELECT event_type,
       CASE WHEN value < 10 THEN 'never'
            WHEN value < 50 THEN 'if_changed'
            ELSE 'always' END AS policy,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


# -- O17: epoch metrics = tumbling time window ---------------------------------
def q_tumbling_window(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    # hour bucket emitted as a formatted string: parquet timestamps are µs,
    # Spark/pandas round-trip them as ns — a string output sidesteps any
    # timestamp-unit mismatch in the value-hash comparison
    return (
        e.withColumn(
            "hour_ts", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        )
        .groupBy("hour_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS("value")).alias("sum_value_cents"),
        )
    )


SQL_TUMBLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


# -- O12: TLS scan fan-out — explode enabled versions → per-version scan →
# map_from_entries + bool_or re-aggregation (reference: the
# Map<TlsProtocolVersion, SingleVersionScan> + connectOK result type,
# /root/reference/src/TODO.MD:27-28, per-version toggles TODO.MD:70-75).
# The map column is rendered as sorted entries so DuckDB can hash-compare.
_TLS_VERSIONS = ["ssl2", "ssl3", "tls10", "tls11", "tls12", "tls13"]


def q_tls_fanout_map(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select("s_suppkey")
    ver = F.explode(F.array(*[F.lit(v) for v in _TLS_VERSIONS])).alias("version")
    x = s.select("s_suppkey", ver).withColumn(
        "hv",
        F.expr(
            "cast(conv(substr(md5(concat('tlscfg|', s_suppkey, '|', version)),1,4),16,10) as bigint)"
        ),
    )
    en = (
        x.where(F.col("hv") % 2 == 0)  # per-version enabled toggle
        .withColumn("connect_ok", F.col("hv") % 5 != 0)
        .withColumn(
            "cipher", F.concat("version", F.lit("-c"), (F.col("hv") % 4).cast("string"))
        )
    )
    agg = en.groupBy("s_suppkey").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("version"),
                        F.struct("connect_ok", "cipher").alias("scan"),
                    )
                )
            )
        ).alias("scan_per_version"),
        F.bool_or("connect_ok").alias("connect_ok_any"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return agg.select(
        "s_suppkey",
        F.concat_ws(
            ";",
            F.expr(
                "transform(map_entries(scan_per_version),"
                " e -> concat(e.key, '=', cast(e.value.connect_ok as string), ',', e.value.cipher))"
            ),
        ).alias("scan_map_str"),
        "connect_ok_any",
        "n_versions",
    )


SQL_TLS = """
WITH ver AS (SELECT unnest(['ssl2','ssl3','tls10','tls11','tls12','tls13']) AS version),
x AS (
  SELECT s_suppkey, version,
         CAST(('0x'||substr(md5('tlscfg|'||s_suppkey||'|'||version),1,4)) AS BIGINT) AS hv
  FROM supplier CROSS JOIN ver),
en AS (
  SELECT s_suppkey, version, hv % 5 <> 0 AS connect_ok,
         version||'-c'||CAST(hv % 4 AS VARCHAR) AS cipher
  FROM x WHERE hv % 2 = 0)
SELECT s_suppkey,
       string_agg(version||'='||CAST(connect_ok AS VARCHAR)||','||cipher, ';' ORDER BY version) AS scan_map_str,
       bool_or(connect_ok) AS connect_ok_any,
       COUNT(*) AS n_versions
FROM en GROUP BY s_suppkey
"""


# -- O14: change detection — lag(value) per entity stream drives the
# screenshot policy ("if_html_changed" = value differs from the previous
# observation; reference policy enum /root/reference/src/TODO.MD:62-67).
def q_change_detect_lag(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    x = e.withColumn("prev", F.lag("value").over(w))
    changed = F.col("prev").isNull() | (F.abs(F.col("value") - F.col("prev")) > 25)
    policy = (
        F.when(F.col("value") < 10, "never")
        .when(F.col("value") < 50, "if_changed")
        .otherwise("always")
    )
    shoot = (policy == "always") | ((policy == "if_changed") & changed)
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(changed, 1).otherwise(0)).cast("long").alias("n_changed"),
        F.sum(F.when(shoot, 1).otherwise(0)).cast("long").alias("n_screenshots"),
    )


SQL_CHANGE = """
WITH x AS (
  SELECT event_type, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
y AS (
  SELECT event_type,
         (prev IS NULL OR abs(value - prev) > 25) AS changed,
         CASE WHEN value < 10 THEN 'never'
              WHEN value < 50 THEN 'if_changed'
              ELSE 'always' END AS policy
  FROM x)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN policy = 'always' OR (policy = 'if_changed' AND changed)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_screenshots
FROM y GROUP BY event_type
"""


# -- O17: frontier-cardinality metric — approx_count_distinct next to the
# exact count; the oracle pins the exact value and asserts the sketch lands
# within tolerance (HLL++ rsd=0.02, checked at 10x slack).
def q_approx_distinct(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("approx") - F.col("n_users_exact"))
            <= 0.2 * F.col("n_users_exact")
        ).alias("approx_ok"),
    )


SQL_APPROX = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact, TRUE AS approx_ok
FROM events GROUP BY event_type
"""


# -- O15 fringe: certificate chain — array-of-struct built by transform over
# sequence, present iff the scan connected (the Optional<List<Certificate>>
# persistence, /root/reference/src/TODO.MD:15-17,50). Rendered as a
# sorted-concatenated string so DuckDB can hash-compare the nested array.
def q_cert_chain_arrays(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select("s_suppkey")
    hv = (
        "cast(conv(substr(md5(concat('certn|', cast(s_suppkey as string)))"
        ",1,4),16,10) as bigint)"
    )
    x = (
        s.withColumn("hv", F.expr(hv))
        .withColumn("connect_ok", F.expr("hv % 5 <> 0"))
        .withColumn("n", F.expr("cast(1 + hv % 3 as int)"))
    )
    chain = F.expr(
        """
        CASE WHEN connect_ok THEN
          transform(sequence(0, n - 1), k -> struct(
            concat('CN=s-', cast(s_suppkey as string), '-l',
                   cast(k as string)) AS subject,
            CASE WHEN k + 1 < n
                 THEN concat('CN=s-', cast(s_suppkey as string), '-l',
                             cast(k + 1 as string))
                 ELSE concat('CN=root-', cast(
                        cast(conv(substr(md5(concat('cert|',
                          cast(s_suppkey as string), '|',
                          cast(k as string))),1,4),16,10) as bigint) % 16
                      as string)) END AS issuer,
            1700000000 + (cast(conv(substr(md5(concat('cert|',
              cast(s_suppkey as string), '|', cast(k as string))),1,4),16,10)
              as bigint) % 100000) * 86400 AS not_after))
        END
        """
    )
    return x.withColumn("certificates", chain).select(
        "s_suppkey",
        "connect_ok",
        # concat_ws over a NULL array yields '' — keep NULL for the
        # disconnected branch so the DuckDB left-join NULL matches
        F.when(
            F.col("certificates").isNotNull(),
            F.expr(
                "concat_ws(';', transform(certificates, c -> concat("
                "c.subject, ',', c.issuer, ',', cast(c.not_after as string))))"
            ),
        ).alias("chain_str"),
        F.coalesce(F.expr("size(certificates)"), F.lit(0))
        .cast("long")
        .alias("n_certs"),
    )


SQL_CERT = """
WITH y AS (
  SELECT s_suppkey,
         CAST(('0x'||substr(md5('certn|'||s_suppkey),1,4)) AS BIGINT) AS hv
  FROM supplier),
g AS (SELECT s_suppkey, hv % 5 <> 0 AS connect_ok, 1 + hv % 3 AS n FROM y),
elems AS (
  SELECT g.s_suppkey, g.n, t.k,
         CAST(('0x'||substr(md5('cert|'||g.s_suppkey||'|'||t.k),1,4)) AS BIGINT) AS hk
  FROM g CROSS JOIN range(3) AS t(k)
  WHERE g.connect_ok AND t.k < g.n),
chains AS (
  SELECT s_suppkey,
         string_agg('CN=s-'||s_suppkey||'-l'||k||','||
           CASE WHEN k + 1 < n THEN 'CN=s-'||s_suppkey||'-l'||(k+1)
                ELSE 'CN=root-'||CAST(hk % 16 AS VARCHAR) END||','||
           CAST(1700000000 + (hk % 100000) * 86400 AS VARCHAR),
           ';' ORDER BY k) AS chain_str,
         COUNT(*) AS n_certs
  FROM elems GROUP BY s_suppkey)
SELECT g.s_suppkey, g.connect_ok, c.chain_str,
       COALESCE(c.n_certs, 0) AS n_certs
FROM g LEFT JOIN chains c USING (s_suppkey)
"""


# -- O8 completion: DNS prefixes/rrtypes fan-out — explode the
# (prefix × rrtype) grid, drop NXDOMAIN pairs, re-assemble the per-entity
# record set ordered by (prefix, rrtype) (/root/reference/src/TODO.MD:58-59).
_DNS_PREFIXES = ["", "www"]
_DNS_RRTYPES = ["A", "AAAA", "MX"]


def q_dns_fanout_records(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select("s_suppkey")
    pair = F.explode(
        F.array(
            *[
                F.struct(F.lit(p).alias("prefix"), F.lit(r).alias("rrtype"))
                for p in _DNS_PREFIXES
                for r in _DNS_RRTYPES
            ]
        )
    ).alias("pair")
    fanned = s.select("s_suppkey", pair).select(
        "s_suppkey", F.col("pair.prefix").alias("prefix"),
        F.col("pair.rrtype").alias("rrtype"),
    )
    x = fanned.withColumn(
        "hv",
        F.expr(
            "cast(conv(substr(md5(concat('dns|', prefix, '|', rrtype, '|',"
            " cast(s_suppkey as string))),1,4),16,10) as bigint)"
        ),
    )
    recs = (
        x.where(F.expr("hv % 4 <> 0"))
        .withColumn(
            "rec",
            F.expr(
                "concat(prefix, ':', rrtype, '=', lower(rrtype), '-',"
                " cast(hv % 4096 as string), '@',"
                " cast(60 + (hv % 4) * 300 as string))"
            ),
        )
        .groupBy("s_suppkey")
        .agg(
            F.concat_ws(";", F.sort_array(F.collect_list("rec"))).alias(
                "record_set"
            ),
            F.count(F.lit(1)).alias("n_records"),
        )
    )
    return (
        s.join(recs, "s_suppkey", "left")
        .withColumn("record_set", F.coalesce("record_set", F.lit("")))
        .withColumn("n_records", F.coalesce("n_records", F.lit(0)))
        .select("s_suppkey", "record_set", "n_records")
    )


SQL_DNS = """
WITH grid AS (
  SELECT p.prefix, r.rrtype
  FROM (SELECT unnest(['', 'www']) AS prefix) p
  CROSS JOIN (SELECT unnest(['A', 'AAAA', 'MX']) AS rrtype) r),
x AS (
  SELECT s_suppkey, prefix, rrtype,
         CAST(('0x'||substr(md5('dns|'||prefix||'|'||rrtype||'|'||s_suppkey),1,4)) AS BIGINT) AS hv
  FROM supplier CROSS JOIN grid),
recs AS (
  SELECT s_suppkey,
         string_agg(prefix||':'||rrtype||'='||lower(rrtype)||'-'||
                    CAST(hv % 4096 AS VARCHAR)||'@'||
                    CAST(60 + (hv % 4) * 300 AS VARCHAR),
                    ';' ORDER BY prefix||':'||rrtype||'='||lower(rrtype)||'-'||
                    CAST(hv % 4096 AS VARCHAR)||'@'||
                    CAST(60 + (hv % 4) * 300 AS VARCHAR)) AS record_set,
         COUNT(*) AS n_records
  FROM x WHERE hv % 4 <> 0 GROUP BY s_suppkey)
SELECT s.s_suppkey, COALESCE(r.record_set, '') AS record_set,
       COALESCE(r.n_records, 0) AS n_records
FROM supplier s LEFT JOIN recs r USING (s_suppkey)
"""


# -- SMTP module: deterministic per-entity banner grab (the last
# VisitRequest module, /root/reference/src/TODO.MD:76).
def q_smtp_probe(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select("s_suppkey")
    return (
        s.withColumn(
            "hv",
            F.expr(
                "cast(conv(substr(md5(concat('smtp|',"
                " cast(s_suppkey as string))),1,4),16,10) as bigint)"
            ),
        )
        .select(
            "s_suppkey",
            F.lit(25).alias("port"),
            F.expr("hv % 5 <> 0").alias("connect_ok"),
            F.expr(
                "CASE WHEN hv % 5 <> 0 THEN concat('220 mx-',"
                " cast(hv % 1024 as string), '.example ESMTP') END"
            ).alias("banner"),
        )
    )


SQL_SMTP = """
SELECT s_suppkey, 25 AS port, hv % 5 <> 0 AS connect_ok,
       CASE WHEN hv % 5 <> 0
            THEN '220 mx-'||CAST(hv % 1024 AS VARCHAR)||'.example ESMTP' END AS banner
FROM (
  SELECT s_suppkey,
         CAST(('0x'||substr(md5('smtp|'||s_suppkey),1,4)) AS BIGINT) AS hv
  FROM supplier)
"""


# -- as-of join ------------------------------------------------------------------
# The temporal join Spark lacks as a primitive (and DuckDB ships natively —
# the oracle uses the real ASOF LEFT JOIN): attach to each purchase the
# most recent view at-or-before it for the same user. The scalable Spark
# shape is NOT a range/cross join: tag both sides, union them, and take a
# running `last(ignorenulls)` over a (user_id, ts)-ordered window — one
# shuffle on user_id, one pass, O(events) state. Views order before
# purchases at equal ts (the ASOF <= convention); testdata has no
# (user_id, ts) duplicates, pinned in tests, so ordering is total.
def q_asof_join_events(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_value"),
        F.lit(None).cast("long").alias("p_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("v_id"),
        F.lit(None).cast("double").alias("v_value"),
        F.col("event_id").alias("p_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        views.unionByName(purchases)
        .withColumn("last_v_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn("last_v_ts", F.last(F.when(F.col("v_id").isNotNull(), F.col("ts")), ignorenulls=True).over(w))
        .withColumn("last_v_value", F.last("v_value", ignorenulls=True).over(w))
        .where(F.col("is_probe") == 1)
    )
    return joined.select(
        F.col("p_id").alias("event_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.coalesce("last_v_id", F.lit(-1)).alias("view_event_id"),
        F.round(F.coalesce("last_v_value", F.lit(0.0)), 2).alias("view_value"),
        F.coalesce(
            # parquet ts is TIMESTAMP_NTZ; the cast-to-instant offsets cancel
            # in the difference, so the lag is timezone-independent
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("last_v_ts").cast("timestamp"))
                )
                / 1000
            ).cast("long"),
            F.lit(-1),
        ).alias("lag_ms"),
    )


SQL_ASOF = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       COALESCE(v.event_id, -1) AS view_event_id,
       ROUND(COALESCE(v.value, 0.0), 2) AS view_value,
       COALESCE((epoch_us(p.ts) - epoch_us(v.ts)) // 1000, -1) AS lag_ms
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


RELATIONAL = {
    "wave_select_rank": (q_wave_select_rank, SQL_WAVE),
    "politeness_quota": (q_politeness_quota, SQL_QUOTA),
    "dedup_anti_join": (q_dedup_anti_join, SQL_ANTI),
    "cache_semi_join": (q_cache_semi_join, SQL_SEMI),
    "broadcast_join_agg": (q_broadcast_join_agg, SQL_BCAST),
    "lineage_rollup": (q_lineage_rollup, SQL_Q1),
    "rollup_groupsets": (q_rollup_groupsets, SQL_ROLLUP),
    "topk_global": (q_topk_global, SQL_TOPK),
    "range_join_window": (q_range_join_window, SQL_RANGE),
    "set_except": (q_set_except, SQL_EXCEPT),
    "json_extract_agg": (q_json_extract_agg, SQL_JSON),
    "md5_shard": (q_md5_shard, SQL_SHARD),
    "case_when_policy": (q_case_when_policy, SQL_POLICY),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLE),
    "tls_fanout_map": (q_tls_fanout_map, SQL_TLS),
    "change_detect_lag": (q_change_detect_lag, SQL_CHANGE),
    "approx_distinct": (q_approx_distinct, SQL_APPROX),
    "cert_chain_arrays": (q_cert_chain_arrays, SQL_CERT),
    "dns_fanout_records": (q_dns_fanout_records, SQL_DNS),
    "smtp_probe": (q_smtp_probe, SQL_SMTP),
    "asof_join_events": (q_asof_join_events, SQL_ASOF),
}
