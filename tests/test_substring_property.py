"""Property-based check of the sliding-window + island-merge
exact-substring report against a brute-force Python twin on small random
corpora — repeated-token runs, shared prefixes/suffixes, and within-doc
repeats are exactly the shapes a hand-built fixture misses."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_batch_processor_spark.operators.dedup import exact_substring_report

N = 3  # small window so tiny random docs can collide
VOCAB = ["a", "b", "c"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 5))
    docs = []
    for did in range(n_docs):
        toks = draw(st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12))
        docs.append((did, " ".join(toks)))
    return docs


def brute(docs):
    grams = defaultdict(set)  # gram -> {(doc, pos)}
    for did, text in docs:
        toks = text.split(" ") if text else []
        for i in range(len(toks) - N + 1):
            grams[tuple(toks[i : i + N])].add((did, i + 1))
    dup_pos = defaultdict(set)
    for occ in grams.values():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                dup_pos[d].add(p)
    out = {}
    for d, ps in dup_pos.items():
        ps = sorted(ps)
        spans = []
        for p in ps:
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        out[d] = (len(spans), sum(e + N - 1 - s + 1 for s, e in spans))
    return out


@settings(
    max_examples=10,  # each example runs a Spark job; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus())
def test_exact_substring_matches_brute_force(spark, case):
    docs = spark.createDataFrame(case, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in exact_substring_report(docs, N).collect()
    }
    assert got == brute(case)


def test_chunk_training_blocks_invariants(spark, sf_dir):
    """Block chunking must tile the concatenated corpus exactly: per-doc
    shares sum to the doc's token count, per-block shares sum to the
    block size (except the final partial block), and block ids are a
    contiguous range starting at 0."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.text import CHUNK_BLOCK
    from go_batch_processor_spark.registry import REGISTRY

    out = REGISTRY["text_chunk_training_blocks"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).toPandas()
    per_doc = out.groupby("doc_id")["tok_in_block"].sum()
    expect = docs.set_index("doc_id")["n"]
    assert (per_doc.sort_index() == expect[per_doc.index].sort_index()).all()
    per_block = out.groupby("block_id")["tok_in_block"].sum().sort_index()
    assert (per_block.iloc[:-1] == CHUNK_BLOCK).all()
    assert 0 < per_block.iloc[-1] <= CHUNK_BLOCK
    blocks = sorted(out["block_id"].unique())
    assert blocks == list(range(len(blocks)))
    assert per_block.sum() == expect.sum()
