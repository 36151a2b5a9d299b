"""Error-bound test for int8 scalar quantization (rows-only query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_quantize_error_within_half_step(spark, sf_dir):
    out = REGISTRY["similarity_quantize_int8"].fn(spark, sf_dir)
    n = out.count()
    assert n == load_table(spark, sf_dir, "embeddings").count()
    # the worst per-dim half-step: (max_d - min_d) / 255 / 2 over all dims
    dims = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(((F.max("x") - F.min("x")) / 255.0 / 2.0).alias("half_step"))
    )
    worst = dims.agg(F.max("half_step")).collect()[0][0]
    got = out.agg(F.max("max_abs_err")).collect()[0][0]
    assert got <= worst * (1 + 1e-9) + 1e-12, (got, worst)
    assert got > 0  # quantization actually loses something


def test_pq_error_shrinks_with_codebook_size_and_is_deterministic(spark, sf_dir):
    """PQ distortion must drop as K grows, and training (deterministic
    seeds + fixed sample) must reproduce bit-identically."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.operators.ml import _as_double
    from go_batch_processor_spark.operators.similarity import (
        PQ_SUBSPACES,
        _pq_train,
    )
    from go_batch_processor_spark.registry import REGISTRY

    row = REGISTRY["similarity_pq_codebook"].fn(spark, sf_dir).collect()[0]
    assert row.mean_mse > 0 and row.max_mse >= row.mean_mse

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("full")
    )
    small = _pq_train(emb, PQ_SUBSPACES, 4, 2)
    big = _pq_train(emb, PQ_SUBSPACES, 16, 2)
    big2 = _pq_train(emb, PQ_SUBSPACES, 16, 2)
    assert big == big2  # deterministic training

    import numpy as np

    X = np.array(
        [np.asarray(r["full"], dtype=np.float64) for r in emb.collect()]
    ).reshape(-1, PQ_SUBSPACES, 64 // PQ_SUBSPACES)

    def mse(books):
        B = np.array(books)
        err = 0.0
        for j in range(PQ_SUBSPACES):
            err += ((X[:, j, None, :] - B[j][None, :, :]) ** 2).sum(2).min(1).sum()
        return err / X.shape[0]

    assert mse(big) < mse(small)  # larger codebooks -> lower distortion


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    """IVF-PQ top-10 must overlap the exact euclidean top-10 well above
    chance (10 of ~500) despite 32x compression + probing only 4/16
    cells, and repeated runs must return identical rows (deterministic
    seeds, sample, and ADC)."""
    import numpy as np

    r1 = REGISTRY["similarity_ivfpq_topk"].fn(spark, sf_dir).collect()
    r2 = REGISTRY["similarity_ivfpq_topk"].fn(spark, sf_dir).collect()
    assert r1 == r2
    got = {r.vec_id for r in r1}
    assert len(got) == 10

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    probe = emb[0]
    exact = sorted(
        (float(((v - probe) ** 2).sum()), k) for k, v in emb.items() if k != 0
    )[:10]
    exact_ids = {k for _, k in exact}
    recall = len(got & exact_ids) / 10
    # measured: 0.5 @ sf0.001, 0.4 @ sf0.01 (deterministic); >= 0.3 allows
    # a changed fixture without letting the index degrade to chance (~0.02)
    assert recall >= 0.3, (recall, sorted(got), sorted(exact_ids))


def test_ivfpq_stored_codes_matches_on_the_fly(spark, sf_dir):
    """The stored-codes index (encode once, JVM ADC fold over codes) must
    return EXACTLY the on-the-fly variant's rows: same coarse quantizer,
    residual codebooks, sample, and seeds — only the storage model differs."""
    r_fly = REGISTRY["similarity_ivfpq_topk"].fn(spark, sf_dir).collect()
    r_stored = REGISTRY["similarity_ivfpq_stored"].fn(spark, sf_dir).collect()
    assert r_stored == r_fly
    assert len(r_stored) == 10


def test_opq_beats_plain_pq(spark, sf_dir):
    """The learned OPQ rotation must reduce full-table reconstruction MSE
    vs plain PQ at the same byte budget, deterministically."""
    r1 = REGISTRY["similarity_opq_codebook"].fn(spark, sf_dir).collect()[0]
    r2 = REGISTRY["similarity_opq_codebook"].fn(spark, sf_dir).collect()[0]
    assert r1 == r2
    assert r1.mse_opq < r1.mse_pq, (r1.mse_opq, r1.mse_pq)


def test_ivfpq_opq_recall(spark, sf_dir):
    """OPQ-rotated IVF-PQ must be deterministic and at least as good as
    the unrotated variant's recall floor."""
    import numpy as np

    r1 = REGISTRY["similarity_ivfpq_opq_topk"].fn(spark, sf_dir).collect()
    r2 = REGISTRY["similarity_ivfpq_opq_topk"].fn(spark, sf_dir).collect()
    assert r1 == r2
    got = {r.vec_id for r in r1}
    assert len(got) == 10

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    probe = emb[0]
    exact = sorted(
        (float(((v - probe) ** 2).sum()), k) for k, v in emb.items() if k != 0
    )[:10]
    recall = len(got & {k for _, k in exact}) / 10
    assert recall >= 0.3, (recall, sorted(got))


def test_ivfpq_artifact_cache_reused(spark, sf_dir):
    """Training artifacts and the stored-codes index are built once per
    (sf_dir, fixture mtime) and reused — repeated invocations (bench warm
    runs) must hit the cache, not retrain/rewrite."""
    import os

    from go_batch_processor_spark.operators import similarity as S

    first = REGISTRY["similarity_ivfpq_stored"].fn(spark, sf_dir).collect()
    n_entries = len(S._ARTIFACT_CACHE)
    assert n_entries >= 1
    key = next(
        k for k in S._ARTIFACT_CACHE if k[-1] == "ivfpq_stored_index"
    )
    path_before = S._ARTIFACT_CACHE[key][2]
    again = REGISTRY["similarity_ivfpq_stored"].fn(spark, sf_dir).collect()
    assert len(S._ARTIFACT_CACHE) == n_entries  # no rebuild
    assert S._ARTIFACT_CACHE[key][2] == path_before
    assert os.path.isdir(path_before)
    assert first == again  # deterministic across cache hit


def test_random_projection_deterministic_and_jl_bound(spark, sf_dir):
    """Must equal the numpy twin exactly (same seed, same matrix) and
    satisfy norm concentration: mean squared norm ratio within 15% of 1
    and >=90% of vectors within a ±2σ band (σ of the squared ratio is
    √(2/m) ≈ 0.35 at m=16, so ±0.7)."""
    import numpy as np
    import pandas as pd

    from go_batch_processor_spark.operators.similarity import RP_OUT_DIM, RP_SEED

    got = (
        REGISTRY["similarity_random_projection"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(RP_SEED)
    R = rng.choice([-1.0, 1.0], size=(X.shape[1], RP_OUT_DIM)) / np.sqrt(RP_OUT_DIM)
    P = X @ R
    np.testing.assert_allclose(
        got["proj_norm"].to_numpy(), np.linalg.norm(P, axis=1), atol=2e-6
    )
    ratio2 = (got["proj_norm"] / got["orig_norm"]) ** 2
    assert abs(ratio2.mean() - 1.0) < 0.15
    assert (abs(ratio2 - 1.0) < 0.7).mean() > 0.90
