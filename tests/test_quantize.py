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
