"""Set operations (SURVEY.md §2.2.g).

UNION ALL is a zero-shuffle concatenation of children; INTERSECT / EXCEPT
plan as hash aggregations + joins on the full row — at scale prefer keyed
semi/anti joins when a key exists (cheaper than whole-row comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register

_SPLIT = "1998-01-01"  # orderdate split point for the two halves


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit(_SPLIT).cast("timestamp")
    return o.filter(F.col("o_orderdate") < cut), o.filter(F.col("o_orderdate") >= cut)


@register(
    "set_union_all",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT}'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two date partitions (no dedup, no shuffle)."""
    lo, hi = _halves(spark, sf_dir)
    cols = ["o_orderkey", "o_totalprice"]
    return lo.select(*cols).unionByName(hi.select(*cols))


@register(
    "set_intersect",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT}'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both halves."""
    lo, hi = _halves(spark, sf_dir)
    return lo.select("o_custkey").intersect(hi.select("o_custkey"))


@register(
    "set_except",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT}'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers active only in the first half.

    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll().distinct()`` would
    wrongly keep values present on both sides with higher left multiplicity).
    """
    lo, hi = _halves(spark, sf_dir)
    return lo.select("o_custkey").subtract(hi.select("o_custkey"))


@register(
    "set_intersect_all",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT}'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a customer with 3 orders in the
    first half and 2 in the second appears min(3,2)=2 times (the
    distinct variant collapses to 1). Plans as per-row counting +
    min-multiplicity replay rather than a distinct hash join; at scale
    the counted form (groupBy key → least of the two counts) is the
    explicit rewrite when multiplicity matters (billing, inventory
    reconciliation)."""
    lo, hi = _halves(spark, sf_dir)
    return lo.select("o_custkey").intersectAll(hi.select("o_custkey"))


@register(
    "set_except_all",
    oracle=f"""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{_SPLIT}'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: keeps max(n_left − n_right, 0)
    copies per row, the reconciliation primitive (what's in the ledger
    but not the statement, counted). Same counted-rewrite note as
    INTERSECT ALL."""
    lo, hi = _halves(spark, sf_dir)
    return lo.select("o_custkey").exceptAll(hi.select("o_custkey"))
