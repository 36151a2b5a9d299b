"""Semantic tests for the LLM-pipeline operators beyond oracle parity."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_finds_all_exact_pairs(spark, sf_dir):
    """LSH with 24 hashes / 12 bands of 2 must recall every exact near-dup
    pair on the fixture corpus (deterministic hashes: if this passes once it
    always passes)."""
    exact = _pairs(REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir))
    lsh = _pairs(REGISTRY["dedup_near_minhash"].fn(spark, sf_dir))
    assert exact, "fixture corpus should contain planted near-dup pairs"
    assert lsh == exact, f"LSH missed {exact - lsh}, extra {lsh - exact}"


def test_simhash_candidates_run(spark, sf_dir):
    df = REGISTRY["dedup_simhash"].fn(spark, sf_dir)
    rows = df.collect()
    for r in rows:
        assert 0 <= r.hamming <= 3
        assert r.doc_a < r.doc_b


def test_ann_lsh_neighbors_are_plausible(spark, sf_dir):
    """Each vector's within-bucket best neighbor has a sane cosine and no
    self-matches."""
    rows = REGISTRY["similarity_ann_lsh"].fn(spark, sf_dir).collect()
    assert rows, "buckets should be non-trivial at 8 planes / 500 vectors"
    for r in rows:
        assert r.vec_id != r.neighbor_id
        assert -1.0 <= r.cosine <= 1.0


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=2/16 cells must recover a reasonable share of the
    true top-10 (deterministic: fixed centroid seeding)."""
    brute = [r.vec_id for r in REGISTRY["similarity_topk_cosine"].fn(spark, sf_dir).collect()]
    ivf = [r.vec_id for r in REGISTRY["similarity_ivf_topk"].fn(spark, sf_dir).collect()]
    assert ivf, "probe cells should not be empty"
    overlap = len(set(brute) & set(ivf))
    assert overlap >= 3, f"IVF recall too low: {overlap}/10 ({ivf} vs {brute})"


def test_stratified_sample_fractions(spark, sf_dir, duck):
    """Realized per-language fractions must sit near the configured rates
    (binomial bounds are loose at fixture size; assert broad sanity)."""
    got = REGISTRY["sample_stratified"].fn(spark, sf_dir).groupBy("lang").count()
    totals = dict(duck.sql("SELECT lang, count(*) FROM documents GROUP BY lang").fetchall())
    for r in got.collect():
        frac = r["count"] / totals[r.lang]
        target = 0.8 if r.lang == "en" else 0.3
        assert abs(frac - target) < 0.25, (r.lang, frac, target)


def test_approx_percentile_rank_error_bounded(spark, sf_dir, duck):
    """The sketch's value must sit within a tight rank band around the
    exact percentile (accuracy=10000 -> rank error ~1e-4)."""
    approx = {
        r.l_returnflag: r.p50_approx
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    for flag, p50 in approx.items():
        lo, hi = duck.sql(
            f"""
            SELECT quantile_cont(l_extendedprice, 0.49),
                   quantile_cont(l_extendedprice, 0.51)
            FROM lineitem WHERE l_returnflag = '{flag}'
            """
        ).fetchone()
        assert lo <= p50 <= hi, (flag, lo, p50, hi)


def test_asof_broadcast_strategy_matches_window_strategy(spark, sf_dir):
    """Both as-of strategies (union+window shuffle vs broadcast packed
    arrays) must produce identical matches."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.joins import asof_join, asof_join_broadcast

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    kw = dict(
        on_time=("ts", "o_orderdate"),
        by=("user_id", "o_custkey"),
        value_cols=["o_orderdate"],
        how="inner",
    )
    a = {(r.event_id, r.asof_o_orderdate) for r in asof_join(ev, o, **kw).collect()}
    b = {
        (r.event_id, r.asof_o_orderdate)
        for r in asof_join_broadcast(ev, o, **kw).collect()
    }
    assert a == b and a


def test_dedup_exact_is_lossless_without_dups(spark, sf_dir, duck):
    n_docs = duck.sql("SELECT count(*) FROM documents").fetchone()[0]
    n_dedup = REGISTRY["dedup_exact"].fn(spark, sf_dir).count()
    n_distinct = duck.sql("SELECT count(DISTINCT text) FROM documents").fetchone()[0]
    assert n_dedup == n_distinct <= n_docs


def test_multiprobe_lsh_dominates_single_probe(spark, sf_dir):
    """Probing the 8 Hamming-1 neighbor buckets must strictly widen
    coverage (every vector finds SOME neighbor) and find a
    better-or-equal best neighbor for every vector single-probe covers."""
    single = {
        r.vec_id: (r.neighbor_id, r.cosine)
        for r in REGISTRY["similarity_ann_lsh"].fn(spark, sf_dir).collect()
    }
    multi = {
        r.vec_id: (r.neighbor_id, r.cosine)
        for r in REGISTRY["similarity_ann_lsh_multiprobe"].fn(spark, sf_dir).collect()
    }
    assert set(single) <= set(multi)
    assert len(multi) > len(single)
    for v, (_, cos_s) in single.items():
        assert multi[v][1] >= cos_s, (v, multi[v], (cos_s,))
    for v, (nb, cos) in multi.items():
        assert v != nb
        assert -1.0 <= cos <= 1.0


def test_exact_substring_matches_brute_force_twin(spark, tmp_path):
    """Hand-built corpus: the sliding-window + island merge must report the
    same maximal cross-doc duplicated spans as a brute-force Python twin."""
    from go_batch_processor_spark.operators.dedup import SUBSTR_N

    base = [f"w{i}" for i in range(60)]
    shared = [f"s{i}" for i in range(SUBSTR_N + 5)]  # one 20-token shared run
    docs = [
        (0, " ".join(base[:10] + shared + base[10:20])),
        (1, " ".join(base[20:40] + shared)),
        (2, " ".join(base[40:60])),  # no duplication
        (3, " ".join(shared[: SUBSTR_N - 1] + base[:30])),  # run too short
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    ddir = str(tmp_path / "fix")
    os.makedirs(f"{ddir}/documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["t"] * len(docs)),
                "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
            }
        ),
        f"{ddir}/documents.parquet/part-0.parquet",
    )

    # brute-force twin
    from collections import defaultdict

    grams = defaultdict(set)  # gram -> {(doc, pos)}
    for did, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - SUBSTR_N + 1):
            grams[" ".join(toks[i : i + SUBSTR_N])].add((did, i + 1))
    dup_pos = defaultdict(set)
    for g, occ in grams.items():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                dup_pos[d].add(p)
    want = {}
    for d, ps in dup_pos.items():
        ps = sorted(ps)
        spans = []
        for p in ps:
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        want[d] = (
            len(spans),
            sum(e + SUBSTR_N - 1 - s + 1 for s, e in spans),
        )

    got = {
        r.doc_id: (r.n_dup_spans, r.dup_tokens)
        for r in REGISTRY["dedup_exact_substring"].fn(spark, ddir).collect()
    }
    assert got == want
    assert 0 in got and 1 in got and 2 not in got and 3 not in got
    # doc 0 and 1 each carry exactly the shared run: SUBSTR_N + 5 tokens
    assert got[0] == (1, SUBSTR_N + 5)
    assert got[1] == (1, SUBSTR_N + 5)


def test_minhash_hot_bucket_caps_to_star_expansion(spark, tmp_path):
    """Adversarial boilerplate corpus (r10 verdict item 7): 1500 docs
    sharing one 60-word boilerplate block (pairwise Jaccard ~0.94, so
    every band collects a giant bucket) must NOT expand to the
    ~1.1M-pair O(D^2) candidate set — buckets past LSH_MAX_BUCKET emit
    a star around the min doc_id instead. The documented trade: the
    pair list is incomplete, but the duplicate CLUSTER stays connected,
    which is what the connected-components consumer needs."""
    import pandas as pd

    from go_batch_processor_spark.operators.dedup import (
        LSH_BANDS,
        LSH_MAX_BUCKET,
        connected_components,
    )
    from go_batch_processor_spark.registry import REGISTRY

    n_docs = 1500
    assert n_docs > LSH_MAX_BUCKET  # the adversarial premise
    boiler = " ".join(f"w{i}" for i in range(60))
    pd.DataFrame(
        [
            {"doc_id": i, "text": f"{boiler} unique{i} tail{i}"}
            for i in range(n_docs)
        ]
    ).to_parquet(tmp_path / "documents.parquet")
    pairs = REGISTRY["dedup_near_minhash"].fn(spark, str(tmp_path))
    rows = pairs.collect()
    # Bounded: star expansion emits <= D-1 pairs per giant bucket per
    # band (plus small non-boiler buckets), nowhere near D(D-1)/2.
    assert 0 < len(rows) <= LSH_BANDS * n_docs, len(rows)
    # Every surviving pair is a genuine near-dup of the boilerplate set.
    assert all(r.jaccard >= 0.6 for r in rows)
    # Cluster-complete: the pairs connect every document into ONE
    # component despite the dropped intra-cluster pairs.
    comp = connected_components(pairs, "doc_a", "doc_b")
    comps = comp.groupBy("component").count().collect()
    n_in_pairs = comp.count()
    assert len(comps) == 1 and comps[0]["count"] == n_in_pairs
    # ... and no more than a handful of docs missed every bucket (a doc
    # is isolated only if all 12 of its band signatures were dominated
    # by its 2 unique shingles — p ~ (2/60)^2 per band, (~0.1%)^12
    # overall; allow slack for hash-specific accidents).
    assert n_in_pairs >= n_docs - 5
