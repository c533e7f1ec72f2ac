"""BPE merge-step twin: the pair-count-over-vocabulary recipe recomputed
with collections.Counter from the raw parquet, compared row-for-row."""

import re
from collections import Counter

import pyarrow.parquet as pq

from monocator_spark.queries.textops import q_bpe_merge_step

SF_DIR = "/root/testdata/sf0.001"


def _python_twin(path):
    texts = pq.read_table(f"{path}/documents.parquet", columns=["text"])["text"]
    vocab = Counter()
    for t in texts.to_pylist():
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    pairs = Counter()
    for w, c in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return [(rn, p, c) for rn, (p, c) in enumerate(ranked, start=1)]


def test_bpe_merge_step_matches_python_twin(spark):
    got = [
        (r["rn"], r["pair"], r["cnt"])
        for r in q_bpe_merge_step(spark, SF_DIR).orderBy("rn").collect()
    ]
    assert got == _python_twin(SF_DIR)
    assert len(got) == 20
