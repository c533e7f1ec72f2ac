"""O14 — screenshot policy + cross-epoch change detection.

Reference: the per-visit screenshot policy enum ``always |
if_single_page_app | if_html_changed | if_developed | if_suspicious``
(/root/reference/src/TODO.MD:62-67). "if_html_changed" is the cross-epoch
comparison: the freshly fetched image's phash against the previous fetch of
the same image — the ``lag(phash) OVER (PARTITION BY image_id ORDER BY
fetch_epoch)`` analytic (SURVEY.md §2.2), evaluated only over the bounded
current wave's images (history is semi-join-pruned before the window, so
the window never sees the full fetched table).

All predicates are pure Catalyst, bit-matching ``spec.screenshot_decision``
(the simulator's implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from monocator_spark import spec


def policy_col(host_col: str = "host") -> F.Column:
    """Per-host policy assignment (VisitRequest ``screenshot`` field)."""
    idx = F.pmod(
        F.xxhash64(F.concat(F.lit(spec.SCREENSHOT_PREFIX), F.col(host_col))),
        F.lit(len(spec.SCREENSHOT_POLICIES)),
    )
    return F.element_at(
        F.array(*[F.lit(p) for p in spec.SCREENSHOT_POLICIES]),
        (idx + 1).cast("int"),
    )


def decision_col() -> F.Column:
    """The policy CASE WHEN over (policy, url_norm, prior_phash, phash,
    caption) columns — ``spec.screenshot_decision`` in Catalyst."""
    n_out = F.pmod(
        F.xxhash64(F.concat(F.lit(spec.OUTLINK_PREFIX), F.col("url_norm"))),
        F.lit(4),
    )
    p = F.col("policy")
    return (
        F.when(p == "always", F.lit(True))
        .when(p == "if_single_page_app", n_out == 0)
        .when(
            p == "if_html_changed",
            F.col("prior_phash").isNull()
            | (F.col("prior_phash") != F.col("phash")),
        )
        .when(p == "if_developed", F.size(F.split("caption", " ")) >= 8)
        .otherwise(F.pmod(F.col("phash"), F.lit(16)) == 0)
    )


def with_screenshot(
    ok: DataFrame, hist: DataFrame | None, epoch: int
) -> DataFrame:
    """ok(fetched-OK rows) → + (prior_phash, policy, screenshot) columns.

    ``hist`` is the fetched table as of the previous epoch (None on the
    first epoch or when change detection is disabled — every row then
    counts as a first fetch, prior_phash null).
    """
    if hist is None:
        out = ok.withColumn("prior_phash", F.lit(None).cast("long"))
    else:
        cur_keys = ok.select("image_id").distinct()
        # prune history to the wave's images BEFORE the window: the lag
        # runs over O(wave) rows, never the whole fetched table
        hist_w = (
            hist.select("image_id", "fetch_epoch", "phash")
            .join(F.broadcast(cur_keys), "image_id", "left_semi")
            .unionByName(
                ok.select(
                    "image_id", F.lit(epoch).alias("fetch_epoch"), "phash"
                )
            )
        )
        w = Window.partitionBy("image_id").orderBy("fetch_epoch")
        prior = (
            hist_w.withColumn("prior_phash", F.lag("phash").over(w))
            .where(F.col("fetch_epoch") == epoch)
            .select("image_id", "prior_phash")
        )
        out = ok.join(F.broadcast(prior), "image_id", "left")
    return out.withColumn("policy", policy_col()).withColumn(
        "screenshot", decision_col()
    )
