"""Projection / filter operators (SURVEY.md §2.2.b).

Pure narrow transformations: no shuffle at any scale. Predicates are
Catalyst-pushed into the parquet scan (min/max row-group pruning), so at
100 TB a selective filter touches only matching row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style conjunctive range predicate (pushed to the scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    ).filter(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    )


@register(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity + l_tax                 AS qty_plus_tax
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection — per-row IEEE double arithmetic is bit-exact
    across engines, so no rounding is needed (registry parity rules)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") + F.col("l_tax")).alias("qty_plus_tax"),
    )


@register(
    "filter_in_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderpriority IS NULL
    """,
)
def filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list plus IS NULL handling (three-valued logic parity)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderpriority", "o_orderstatus").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        | F.col("o_orderpriority").isNull()
    )
