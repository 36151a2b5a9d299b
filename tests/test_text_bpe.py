"""Pure-Python twin of the distributed BPE merge trainer: both implement
greedy (count DESC, pair ASC) merges with Sennrich-style left-to-right
non-overlapping replacement (lookaround re.sub — consecutive occurrences
ALL merge), so the merge tables must match EXACTLY."""

from __future__ import annotations

import re
from collections import Counter

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.operators.text import BPE_TRAIN_MERGES
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = {" ".join(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(n_merges):
        counts: Counter = Counter()
        for seq, f in vocab.items():
            syms = seq.split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[f"{a} {b}"] += f
        if not counts:
            break
        # top-1 by (count DESC, pair ASC)
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, n))
        # Sennrich et al. 2016 learn_bpe replacement: symbol-boundary
        # lookarounds, so consecutive occurrences all merge.
        pat = re.compile(r"(?<!\S)" + re.escape(pair) + r"(?!\S)")
        vocab_next: dict[str, int] = {}
        for seq, f in vocab.items():
            new_seq = pat.sub(merged, seq)
            vocab_next[new_seq] = vocab_next.get(new_seq, 0) + f
        vocab = vocab_next
    return merges


def test_python_twin_merges_consecutive_occurrences():
    """The round-4 space-padded replace skipped every other occurrence in
    a run ('a a a a' -> 'ab a a'); the fold must merge them all."""
    merges = _python_bpe({"aaaa": 5, "aa": 3}, 1)
    assert merges == [(0, "a a", "aa", 5 * 3 + 3)]
    # and the distributed trainer's splice is pinned equal to the twin by
    # test_bpe_train_matches_python_twin below


def test_bpe_train_matches_python_twin(spark, sf_dir):
    from pyspark.sql import functions as F

    got = [
        (r.step, r.pair, r.merged, r.weighted_count)
        for r in REGISTRY["text_bpe_train_merges"].fn(spark, sf_dir).collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    freqs = {
        r["word"]: r["freq"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    want = _python_bpe(freqs, BPE_TRAIN_MERGES)
    assert got == want
    assert len(got) == BPE_TRAIN_MERGES  # fixture corpus is rich enough


def _python_bpe_encode(word: str, merges) -> int:
    """Apply trained merges in order with the same lookaround replacement;
    return the resulting subword token count."""
    seq = " ".join(word)
    for _, pair, merged, _ in merges:
        pat = re.compile(r"(?<!\S)" + re.escape(pair) + r"(?!\S)")
        seq = pat.sub(merged, seq)
    return len(seq.split(" "))


def test_bpe_encode_matches_python_twin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").toPandas()
    word_freqs: dict[str, int] = {}
    per_doc_words: dict[int, list[str]] = {}
    for _, row in docs.iterrows():
        words = [w for w in row["text"].split(" ") if w]
        per_doc_words[row["doc_id"]] = words
        for w in words:
            word_freqs[w] = word_freqs.get(w, 0) + 1
    merges = _python_bpe(word_freqs, BPE_TRAIN_MERGES)
    tok_of = {w: _python_bpe_encode(w, merges) for w in word_freqs}

    out = REGISTRY["text_bpe_encode"].fn(spark, sf_dir).toPandas()
    got = out.set_index("doc_id")
    for doc_id, words in per_doc_words.items():
        expect_chars = sum(len(w) for w in words)
        expect_toks = sum(tok_of[w] for w in words)
        assert got.loc[doc_id, "char_tokens"] == expect_chars, doc_id
        assert got.loc[doc_id, "bpe_tokens"] == expect_toks, doc_id
    # merges must actually compress: every doc's bpe count < char count
    assert (out["bpe_tokens"] < out["char_tokens"]).all()
