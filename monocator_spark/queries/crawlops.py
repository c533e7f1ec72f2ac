"""Oracle-gated crawl-operator queries (SURVEY.md §2 O2, O6).

Until now O2 (URL canonicalization) and O6 (robots longest-prefix match)
were pinned only by pytest (adversarial grid / rule table) and the
engine-vs-simulator golden runs — no entry in the driver's DuckDB oracle
surface. These two queries close that: each runs the PRODUCTION code path
(the `canonicalize_udf` Arrow UDF from `functions/urlnorm.py:163`; the
`_ROBOTS_ALLOWED` Catalyst higher-order function from
`operators/politeness.py:24`) over inputs synthesized deterministically
from `documents.doc_id` on BOTH engines, with the oracle expressing the
expected semantics independently (literal RFC 3986 expectations per
adversarial class; a window-ranked longest-prefix-wins reimplementation).

Reference analogues: URL-seen canonical form [canon — RFC 3986 §6
syntax-based normalization, Mercator lineage]; robots rules per RFC 9309
longest-match / allow-wins-ties (/root/reference/src/TODO.MD:57-76 module
gating).

Scale: both are scan-local map-side expressions — no shuffle, no driver
action; the only join is a ≤4-row broadcast rules table. They cost one
pass over the corpus at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monocator_spark.functions.urlnorm import canonicalize_udf
from monocator_spark.operators.politeness import _ROBOTS_ALLOWED
from monocator_spark.queries.relational import T

# --- O2: URL canonicalization over an adversarial class grid ----------------
# 12 classes × hosts varied by doc_id % 97: already-canonical passthrough,
# case folding, default-port stripping (80/443), non-default port kept,
# fragment drop, dot-segment resolution, empty path, percent-decode of
# unreserved, percent-case uppercasing of reserved, query untouched,
# schemeless → NULL.
_HOST_SPARK = "concat('h', cast(doc_id % 97 as string), '.example')"
_HOST_DUCK = "'h' || CAST(doc_id % 97 AS VARCHAR) || '.example'"

_RAW_URL_SPARK = f"""
    CASE doc_id % 12
      WHEN 0 THEN concat('http://', {_HOST_SPARK}, '/a/b')
      WHEN 1 THEN concat('HTTP://', upper({_HOST_SPARK}), '/a/b')
      WHEN 2 THEN concat('http://', {_HOST_SPARK}, ':80/x')
      WHEN 3 THEN concat('https://', {_HOST_SPARK}, ':443/x')
      WHEN 4 THEN concat('http://', {_HOST_SPARK}, ':8080/x')
      WHEN 5 THEN concat('http://', {_HOST_SPARK}, '/p#frag')
      WHEN 6 THEN concat('http://', {_HOST_SPARK}, '/a/./b/../c')
      WHEN 7 THEN concat('http://', {_HOST_SPARK})
      WHEN 8 THEN concat('http://', {_HOST_SPARK}, '/%41bc')
      WHEN 9 THEN concat('http://', {_HOST_SPARK}, '/a%2fb')
      WHEN 10 THEN concat('http://', {_HOST_SPARK}, '/p?q=%41')
      ELSE concat({_HOST_SPARK}, '/x')
    END
"""


def q_urlnorm_grid(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    return d.select(
        "doc_id", canonicalize_udf(F.expr(_RAW_URL_SPARK)).alias("url_canon")
    )


# The oracle states the EXPECTED canonical form per class directly — an
# independent statement of the RFC 3986 rules, not a re-run of the UDF.
SQL_URLNORM = f"""
SELECT doc_id,
  CASE doc_id % 12
    WHEN 0 THEN 'http://' || {_HOST_DUCK} || '/a/b'
    WHEN 1 THEN 'http://' || {_HOST_DUCK} || '/a/b'
    WHEN 2 THEN 'http://' || {_HOST_DUCK} || '/x'
    WHEN 3 THEN 'https://' || {_HOST_DUCK} || '/x'
    WHEN 4 THEN 'http://' || {_HOST_DUCK} || ':8080/x'
    WHEN 5 THEN 'http://' || {_HOST_DUCK} || '/p'
    WHEN 6 THEN 'http://' || {_HOST_DUCK} || '/a/c'
    WHEN 7 THEN 'http://' || {_HOST_DUCK} || '/'
    WHEN 8 THEN 'http://' || {_HOST_DUCK} || '/Abc'
    WHEN 9 THEN 'http://' || {_HOST_DUCK} || '/a%2Fb'
    WHEN 10 THEN 'http://' || {_HOST_DUCK} || '/p?q=%41'
    ELSE NULL
  END AS url_canon
FROM documents
"""


# --- O6: robots longest-prefix match, allow wins ties ------------------------
# Hosts doc_id % 4 carry a fixed rule grid covering: nested prefixes with
# opposite verdicts, a disallow-all + allow-subtree pair, an exact tie
# (allow must win), and a rule-less host (default allow). Paths doc_id % 5
# hit every branch.
_RULES = [
    (0, "/priv", False),
    (0, "/priv/open", True),
    (0, "/", True),
    (1, "/", False),
    (1, "/pub", True),
    (2, "/a", False),
    (2, "/a", True),
]

_PATH_SPARK = (
    "CASE doc_id % 5 WHEN 0 THEN '/priv/x' WHEN 1 THEN '/priv/open/y'"
    " WHEN 2 THEN '/pub/z' WHEN 3 THEN '/a/b' ELSE '/other' END"
)
_PATH_DUCK = _PATH_SPARK  # identical dialect for this expression


def q_robots_longest_match(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id")
    urls = d.select(
        "doc_id",
        (F.col("doc_id") % 4).cast("int").alias("host_id"),
        F.concat(
            F.lit("http://rh"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".test"),
            F.expr(_PATH_SPARK),
        ).alias("url_norm"),
    )
    rules = (
        spark.createDataFrame(_RULES, "host_id int, path_prefix string, allow boolean")
        .groupBy("host_id")
        .agg(F.collect_list(F.struct("path_prefix", "allow")).alias("robots_rules"))
    )
    return urls.join(F.broadcast(rules), "host_id", "left").select(
        "doc_id", F.expr(_ROBOTS_ALLOWED).alias("allowed")
    )


_RULES_SQL = ", ".join(
    f"({h}, '{p}', {str(a).lower()})" for h, p, a in _RULES
)

SQL_ROBOTS = f"""
WITH urls AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS host_id, {_PATH_DUCK} AS path
  FROM documents
), rules(host_id, path_prefix, allow) AS (
  VALUES {_RULES_SQL}
), matched AS (
  SELECT u.doc_id, r.allow,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.path_prefix) DESC, r.allow DESC
         ) AS rn
  FROM urls u
  JOIN rules r
    ON u.host_id = r.host_id AND starts_with(u.path, r.path_prefix)
)
SELECT u.doc_id, coalesce(m.allow, true) AS allowed
FROM urls u
LEFT JOIN (SELECT doc_id, allow FROM matched WHERE rn = 1) m USING (doc_id)
"""


CRAWLOPS = {
    "urlnorm_grid": (q_urlnorm_grid, SQL_URLNORM),
    "robots_longest_match": (q_robots_longest_match, SQL_ROBOTS),
}
