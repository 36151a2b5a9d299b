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
