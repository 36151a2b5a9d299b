"""Partitioning-invariance property: operators whose docstrings claim
content-stable determinism ("same rows win on any partitioning") must
produce IDENTICAL results under different shuffle-partition settings —
the local stand-in for running on a differently-sized cluster.

rand()/sample()-based operators cannot pass this; every md5-uniform /
hash-keyed operator must.
"""

from __future__ import annotations

import pandas as pd
import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

INVARIANT_KEYS = [
    "sample_reservoir_weighted",
    "sample_temperature_mixing",
    "sample_hash_deterministic",
    "stats_bootstrap_poisson_ci",
    "feature_hashing_trick",
    "stats_mann_whitney",
    "text_chunk_training_blocks",
    "similarity_knn_graph",
    # fifth-session additions claiming content-stable determinism
    "sample_balanced_classes",
    "sample_negative_sampling",
    "ml_kfold_split",
    "agg_kmv_theta_intersect",
    "agg_weighted_percentile",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", INVARIANT_KEYS)
def test_result_invariant_under_shuffle_partitioning(spark, sf_dir, name):
    fn = REGISTRY[name].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(fn(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _canon(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    pd.testing.assert_frame_equal(a, b)
