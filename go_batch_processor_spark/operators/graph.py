"""Iterative graph analytics over the events-derived interaction graph
(extension inventory — the reference has no graph surface,
/root/reference/batch_processor.go:10-28; connected components lives in
dedup.py as dedup_cluster_components, PageRank completes the family).

The graph: users and items (the ``k`` key of events.props) as nodes,
an undirected edge for every distinct (user, item) interaction —
the standard bipartite engagement graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register

PR_ITERS = 5
PR_DAMPING = 0.85
PR_TOP_K = 20


def interaction_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (user, item) interaction edges as two directed
    rows each. Node ids are namespaced into one long key space:
    user -> 2*user_id, item -> 2*k + 1 (disjoint, join-friendly)."""
    e = load_table(spark, sf_dir, "events")
    pairs = (
        e.select(
            (F.col("user_id") * 2).alias("u"),
            (F.get_json_object("props", "$.k").cast("long") * 2 + 1).alias("i"),
        )
        .filter(F.col("i").isNotNull())
        .distinct()
    )
    fwd = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst"))
    rev = pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, iters: int = PR_ITERS, d: float = PR_DAMPING) -> DataFrame:
    """Classic power-iteration PageRank over an edge list.

    Scale shape (the canonical iterative-join pattern): the out-degreed
    edge list is persisted ONCE and every iteration pays exactly one
    join (ranks x edges on src — co-partitioned after the first
    iteration, AQE keeps the partitioning) plus one partial-combinable
    groupBy(dst); rank lineage is truncated with localCheckpoint every
    other iteration, the same guard dedup_cluster_components uses. No
    driver-side state beyond the node count (1-row aggregate). Every
    node here has >= 1 edge by construction, so there is no dangling-
    mass correction term."""
    from pyspark import StorageLevel

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = ed.select("src").distinct().count()
        ranks = ed.select("src").distinct().select(
            F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
        )
        for it in range(iters):
            contribs = ed.join(
                ranks, ed.src == F.col("node"), "inner"
            ).select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            ranks = contribs.groupBy(F.col("dst").alias("node")).agg(
                ((1.0 - d) / n + d * F.sum("c")).alias("rank")
            )
            if it % 2 == 1:
                ranks = ranks.localCheckpoint(eager=False)
        return ranks
    finally:
        ed.unpersist(blocking=False)


@register("graph_pagerank", tags={"rows_only"})
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite user-item engagement graph: the top-20
    most central nodes across both sides (which side dominates depends on
    the degree distribution at a given SF). Rows-only (iterative);
    tests/test_graph.py asserts agreement with a numpy power-iteration
    twin and that rank mass is conserved."""
    ranks = pagerank(interaction_edges(spark, sf_dir))
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("user")).otherwise(F.lit("item")).alias("kind"),
            F.floor(F.col("node") / 2).alias("entity_id"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), F.col("kind").asc(), F.col("entity_id").asc())
        .limit(PR_TOP_K)
    )
