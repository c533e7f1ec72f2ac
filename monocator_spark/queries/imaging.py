"""Image near-duplicate detection over perceptual hashes (SURVEY.md §2 O11
payload axis + the training-data dedup brief).

The corpus invariant (`BASELINE.json` input_hint) carries ``phash:int64``
per image; near-duplicate images differ in a few bits of that hash. At
100 TB scale the all-pairs Hamming join is impossible, so the production
plan is *bit-sampling LSH on the hash itself*: split the hash into ``b``
contiguous bands — any pair within Hamming distance ``r`` (r < b) agrees
on ≥1 whole band by pigeonhole — join on (band_id, band_value), then
verify candidates with an exact popcount. The banded plan is therefore
*exactly* equivalent to the brute-force join at threshold r ≤ b-1, which
is what the DuckDB oracle pins: the oracle keeps the naive quadratic
self-join, the Spark side ships the banded one, and the driver
hash-compares the results.

Testdata has no image bytes, so the hash column is synthesized
deterministically on BOTH engines from ``documents.doc_id`` with planted
near-dup structure: ~5 docs per group share an md5-derived 60-bit base
hash; non-representative members flip 1-2 doc_id-dependent bits, so
intra-group Hamming ≤ 4 while inter-group distance concentrates at ~30.
Band parameters: 6 bands × 10 bits covers the 60-bit hash; threshold 4 ≤
b-1 = 5 keeps the pigeonhole guarantee. (On a real 64-bit phash corpus
you'd pick 4×16-bit bands for threshold ≤ 3 — wider bands mean smaller
LSH buckets, the right trade when the corpus is billions of images.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monocator_spark.queries.relational import T

_N_GROUPS = 100
_BANDS = 6
_BAND_BITS = 10
_THRESHOLD = 4

# 60-bit base hash per group (15 md5 hex digits — always positive)
_BASE_SPARK = (
    "cast(conv(substr(md5(concat('img|', cast(doc_id % {g} as string))),1,15),16,10)"
    " as bigint)".format(g=_N_GROUPS)
)
_BASE_DUCK = (
    "CAST(('0x'||substr(md5('img|'||CAST(doc_id % {g} AS VARCHAR)),1,15)) AS BIGINT)"
    .format(g=_N_GROUPS)
)

# planted near-dup noise: group representative (doc_id % 5 = 0) keeps the
# base; others flip bit (doc_id % 60), and the doc_id % 5 >= 3 ones flip a
# second bit (doc_id*7 % 60) — intra-group Hamming ≤ 4 = _THRESHOLD
_PHASH_SPARK = (
    f"({_BASE_SPARK}"
    " ^ (case when doc_id % 5 = 0 then cast(0 as bigint)"
    "    else shiftleft(cast(1 as bigint), cast(doc_id % 60 as int)) end)"
    " ^ (case when doc_id % 5 >= 3"
    "    then shiftleft(cast(1 as bigint), cast((doc_id * 7) % 60 as int))"
    "    else cast(0 as bigint) end))"
)
_PHASH_DUCK = (
    f"xor(xor({_BASE_DUCK},"
    " CASE WHEN doc_id % 5 = 0 THEN CAST(0 AS BIGINT)"
    "      ELSE CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT) END),"
    " CASE WHEN doc_id % 5 >= 3"
    "      THEN CAST(1 AS BIGINT) << CAST((doc_id * 7) % 60 AS INT)"
    "      ELSE CAST(0 AS BIGINT) END)"
)


def q_phash_hamming_pairs(spark, sf_dir):
    """Banded-LSH Hamming join: candidates from band-equality, exact
    popcount verify. Output ≡ brute-force pairs at Hamming ≤ 4."""
    d = T(spark, sf_dir, "documents")
    ph = d.select("doc_id", F.expr(_PHASH_SPARK).alias("phash"))
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(F.expr(f"sequence(0, {_BANDS - 1})")).alias("band_id"),
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(phash, cast(band_id * {_BAND_BITS} as int))"
            f" & cast({(1 << _BAND_BITS) - 1} as bigint)"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("bit_count(pa ^ pb)").cast("int")
        )
        .where(F.col("hamming") <= _THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )


SQL_PHASH_PAIRS = f"""
WITH ph AS (
  SELECT doc_id, {_PHASH_DUCK} AS phash FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_THRESHOLD}
"""


def q_phash_dedup_groups(spark, sf_dir):
    """Image near-dup dedup as a pipeline consumes it: every image mapped
    to a cluster representative (min doc_id sharing any hash band) — the
    O(images) output shape, not the quadratic pair list. Same window-min
    trick as ``minhash_dedup_groups``: referencing the band table twice
    through a groupBy+self-join would recompute it."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    ph = d.select("doc_id", F.expr(_PHASH_SPARK).alias("phash"))
    bands = ph.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {_BANDS - 1})")).alias("band_id"),
        "phash",
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(phash, cast(band_id * {_BAND_BITS} as int))"
            f" & cast({(1 << _BAND_BITS) - 1} as bigint)"
        ),
    )
    wb = Window.partitionBy("band_id", "band_val")
    return (
        bands.withColumn("grp_rep", F.min("doc_id").over(wb))
        .groupBy("doc_id")
        .agg(F.min("grp_rep").alias("rep_id"))
        .withColumn("is_dup", F.col("doc_id") > F.col("rep_id"))
    )


SQL_PHASH_GROUPS = f"""
WITH ph AS (
  SELECT doc_id, {_PHASH_DUCK} AS phash FROM documents
),
bands AS (
  SELECT doc_id, band_id,
         (phash >> (band_id * {_BAND_BITS})) & {(1 << _BAND_BITS) - 1} AS band_val
  FROM ph, (SELECT unnest(range(0, {_BANDS})) AS band_id) b
),
rep AS (
  SELECT doc_id, band_id, band_val,
         MIN(doc_id) OVER (PARTITION BY band_id, band_val) AS grp_rep
  FROM bands
)
SELECT doc_id, MIN(grp_rep) AS rep_id, doc_id > MIN(grp_rep) AS is_dup
FROM rep GROUP BY doc_id
"""


IMAGING = {
    "phash_hamming_pairs": (q_phash_hamming_pairs, SQL_PHASH_PAIRS),
    "phash_dedup_groups": (q_phash_dedup_groups, SQL_PHASH_GROUPS),
}
