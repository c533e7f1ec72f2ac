#!/usr/bin/env python
"""Bench harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Every query is forced end-to-end with a noop sink (full materialization,
no driver collect). The reported value is total seconds across headline
queries; per-query seconds are in "queries".

Protocol: $SPARK_GRAFT_REPS full passes over the list (default 2),
per-query best-of — single-run numbers on this host drift ±15-20%
between sessions (documented in BENCH/BASELINE.md), which round 2's
single-pass bench misread as a ~25% phantom regression. Raw per-pass
numbers are kept in "queries_all_reps" so drift stays visible.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from monocator_spark.queries import REGISTRY  # noqa: E402
from monocator_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "wave_select_rank",
    "politeness_quota",
    "dedup_anti_join",
    "broadcast_join_agg",
    "lineage_rollup",
    "topk_global",
    "range_join_window",
    "asof_join_events",
    "json_extract_agg",
    "tumbling_window",
    "token_count",
    "token_count_bpe",
    "bpe_merge_step",
    "bpe_train_k",
    "bpe_vocab_stats",
    "quality_score",
    "fingerprint_doc",
    "shingle_jaccard_pairs",
    "minhash_dedup_groups",
    "simhash_docs",
    "simhash_dedup_groups",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "ann_ivf_bucketed",
    "ann_pq_adc",
    "bloom_build_stats",
    "cuckoo_build_stats",
    "tls_fanout_map",
    "cert_chain_arrays",
    "dns_fanout_records",
    "smtp_probe",
    "change_detect_lag",
    "approx_distinct",
    "semantic_dedup_twostage",
    "phash_hamming_pairs",
    "phash_dedup_groups",
    "ngram_topk",
    "tfidf_topk",
    "sample_stratified",
    "vat_scrape_decision",
    "doc_repetition_stats",
    "pii_scrub_stats",
    "source_curation_rollup",
    "group_quantiles_exact",
    "winsorized_stats_group",
    "contamination_ngram",
    "html_text_extract",
    "paragraph_dedup_stats",
    "dedup_keep_best",
    "perplexity_bucket",
    "dedup_connected_components",
    "dedup_cc_largestar",
    "substring_dedup_spans",
    "domain_cap_sample",
    "mix_weights_epochs",
    "sequence_pack_chunks",
    "kmeans_iter_assign",
    "semdedup_cluster_prune",
    "cluster_balanced_sample",
    "image_resize_thumb",
    "image_quality_gate",
    "image_aspect_bucket",
    "caption_image_filter",
    "clip_alignment_gate",
    "frame_sample_stub",
    "audio_window_energy",
    "bm25_topk",
    "split_assign",
    "dedup_incremental_newbatch",
    "bpe_tokenize_docs",
    "phash_incremental_newbatch",
    "urlnorm_grid",
    "robots_longest_match",
    "tumbling_window_stream",
    "session_gap_user",
    "dedup_stream_first_seen",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Arrow path once so q1 doesn't pay session startup
    REGISTRY["topk_global"][0](spark, sf_dir).write.format("noop").mode("overwrite").save()

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    all_reps: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            fn, _ = REGISTRY[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            all_reps[name].append(round(time.monotonic() - t0, 3))

    per_query = {name: min(ts) for name, ts in all_reps.items()}
    total = sum(per_query.values())

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "queries_all_reps": all_reps,
                "reps": reps,
                "protocol": "per-query best-of-%d" % reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
