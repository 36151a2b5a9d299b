"""Parallelism-pinning repartition helpers shared across operator
families (moved here from operators/dedup.py in r14 — ADVICE: a generic
repartition helper living in the dedup module was an odd dependency
direction for graph/stats/text/ml/similarity importers).

Names keep the leading underscore so every existing import site
(including operators.dedup's re-export) stays source-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Rebalance input ahead of a row-amplifying, compute-heavy transform
    (shingle explode + k hash functions is a ~50x amplification).

    Rationale: task count of a parquet scan is bound by row groups; a
    single-row-group file makes the amplification stage single-task no
    matter the cluster size. The repartition shuffles only the compact
    pre-amplification rows — measured 2x end-to-end locally, and at scale
    it bounds amplification skew regardless of input file layout.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` at full parallelism, as an EXPLICIT
    user repartition.

    Two properties matter (r13): (a) a downstream join/groupBy on the
    same key reuses the partitioning (no second exchange, unlike the
    round-robin `_spread`); (b) AQE never coalesces a user-specified
    partition count, so a small-bytes frame that feeds a row-AMPLIFYING
    stage (pair self-joins, rank-join probes) keeps its parallelism
    under size-based coalescing — AQE decides by shuffle bytes and is
    blind to downstream per-row amplification (the measured
    graph_resource_allocation 3.6x cliff; OPTIMIZATION_r13.md)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *[F.col(c) for c in cols])
