"""Operator inventory (SURVEY.md §2.2) — importing this package registers
every query into go_batch_processor_spark.registry.REGISTRY."""

from go_batch_processor_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    cdc,
    composite,
    dedup,
    diagnostics,
    filters,
    graph,
    joins,
    ml,
    multimodal,
    pipeline_ops,
    similarity,
    scalars,
    scans,
    setops,
    sorts,
    stats,
    streaming_batch,
    text,
    timeseries,
    udfs,
    windows,
)
