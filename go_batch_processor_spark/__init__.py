"""go_batch_processor_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference library
``leokuzmanovic/go-batch-processor`` (a bounded-concurrency micro-batch
pipeline: Supplier -> Processor -> Finalizer, /root/reference/
batch_processor.go:10-28) on top of Apache Spark, and extends it with the
relational + LLM-data-pipeline operator inventory declared in SURVEY.md §2.2.

Layout:
  session.py    — SparkSession factory (UTC, AQE, Arrow; 100 TB-ready defaults)
  catalog.py    — explicit StructType schemas + table loaders (never infer)
  registry.py   — query registry: name -> (query fn, DuckDB oracle SQL)
  operators/    — the operator inventory, DataFrame-first
  pipeline/     — BatchPipeline: the reference's R1-R11 semantics over
                  Structured Streaming foreachBatch
"""

from go_batch_processor_spark.session import get_spark
from go_batch_processor_spark.catalog import load_table, load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]
