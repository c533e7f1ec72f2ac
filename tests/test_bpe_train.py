"""Full BPE trainer loop (bpe_train_k) vs a pure-Python Counter trainer.

The Python twin is the textbook GPT-2-style loop: count adjacent symbol
pairs over the (word, count) vocabulary, merge the argmax pair
left-to-right non-overlapping, repeat. Ties break (count DESC, left ASC,
right ASC) — the same rule both engines pin.
"""
import re
import sys
from collections import Counter
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def _python_bpe(texts, k):
    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    seqs = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            wc = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def _python_bpe_full(texts, k):
    """Same trainer, but also returns the final symbol sequences."""
    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    seqs = {w: list(w) for w in vocab}
    merges = _python_bpe(texts, k)
    for _step, a, b, _m, _c in merges:
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, vocab, seqs


def test_bpe_train_k_matches_python_trainer(spark):
    from monocator_spark.queries.textops import _BPE_TRAIN_K, q_bpe_train_k

    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"].tolist()
    expected = _python_bpe(texts, _BPE_TRAIN_K)
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in q_bpe_train_k(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == expected
    assert len(got) == _BPE_TRAIN_K


def test_bpe_vocab_stats_matches_python_trainer(spark):
    from monocator_spark.queries.textops import _BPE_TRAIN_K, q_bpe_vocab_stats

    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"].tolist()
    _merges, vocab, seqs = _python_bpe_full(texts, _BPE_TRAIN_K)
    freq = Counter()
    for w, syms in seqs.items():
        for s in syms:
            freq[s] += vocab[w]
    expected = [
        (i + 1, tok, cnt)
        for i, (tok, cnt) in enumerate(
            sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
        )
    ]
    got = [
        (r["rank"], r["token"], r["freq"])
        for r in q_bpe_vocab_stats(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expected


def test_bpe_tokenize_docs_matches_python_twin(spark):
    """Corpus tokenize-apply vs the pure-Python twin: per doc, the word
    count, token count, and the md5 fingerprint of the comma-joined
    token-id sequence (a..z → 1..26, step-s merge → 26+s)."""
    import hashlib

    from monocator_spark.queries.textops import _BPE_TRAIN_K, q_bpe_tokenize_docs

    df = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    merges, _vocab, seqs = _python_bpe_full(df["text"].tolist(), _BPE_TRAIN_K)
    tid = {}
    for step, _a, _b, merged, _c in merges:
        tid.setdefault(merged, 26 + step)

    def sym_id(s):
        return ord(s) - 96 if len(s) == 1 else tid[s]

    expected = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        words = [w for w in re.split("[^a-z]+", text.lower()) if len(w) >= 2]
        if not words:
            continue
        ids = [sym_id(s) for w in words for s in seqs[w]]
        fp = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
        expected[int(doc_id)] = (len(words), len(ids), fp)

    got = {
        int(r["doc_id"]): (r["n_words"], r["n_tokens"], r["tok_fp"])
        for r in q_bpe_tokenize_docs(spark, SF_DIR).collect()
    }
    assert got == expected
