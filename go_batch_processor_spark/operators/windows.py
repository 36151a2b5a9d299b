"""Window-function operators (SURVEY.md §2.2.e).

One shuffle per distinct (partitionBy, orderBy) pair; the engine reuses a
single window spec per query so Catalyst plans exactly one Window node.
Determinism rule (SURVEY.md §7.2.4): every orderBy carries a unique
tiebreak key — without it rank/lag results are partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


@register(
    "window_rank_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    )
    WHERE rn <= 3
    """,
)
def window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number + rank).

    At scale this is the canonical top-k-per-group: one shuffle on the group
    key, per-group heap in the Window exec — never a global sort.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           value - lag(value)  OVER w AS delta_prev,
           lead(value) OVER w          AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas via lag/lead (event_id tiebreak on the time axis)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_ntile_distribution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ntile(4)       OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    (deterministic via the orderkey tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value windows; last/nth use the full-partition frame
    (the default running frame makes last_value just the current row — the
    classic window-frame trap, pinned explicitly on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


@register(
    "window_range_interval_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           count(*) OVER w            AS n_last_hour,
           round(sum(value) OVER w, 2) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame with an interval bound: per-user trailing
    1-hour count/sum. RANGE frames are tie-safe by construction (rows with
    equal ts share a frame), so no tiebreak key is needed — unlike every
    ROWS frame in this module."""
    from go_batch_processor_spark.catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               count(*) OVER w             AS n_last_hour,
               round(sum(value) OVER w, 2) AS value_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer with an explicit ROWS frame.

    Both engines accumulate in the same deterministic order (orderdate,
    orderkey), but the running double sum is still rounded on both sides —
    registry parity rules.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_gaps_islands",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    r AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM ud
    ),
    isl AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM isl GROUP BY user_id
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via the
    classic date-minus-row_number island key, then one aggregate per island
    and one per user.

    Scale: the window partitions by user_id — state is one counter per
    user-partition, no global sort; everything after the distinct is
    proportional to distinct user-days. This is the streak/uptime/session
    compaction shape every activity warehouse needs.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    r = ud.select(
        "user_id", "d", F.date_sub("d", F.row_number().over(w)).alias("grp")
    )
    isl = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


@register(
    "window_percent_cume",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: percent_rank (rank-1)/(n-1) and
    cume_dist over account balance within market segment, with a
    deterministic custkey tiebreak in the ordering (ties would otherwise
    make percent_rank engine-dependent)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_pattern_vshape",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             lag(value, 2)  OVER w AS m2,
             lag(value, 1)  OVER w AS m1,
             lead(value, 1) OVER w AS p1,
             lead(value, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, round(value, 2) AS trough,
           round(m2 - value, 2) AS drop_depth,
           round(p2 - value, 2) AS recovery
    FROM seq
    WHERE m2 > m1 AND m1 > value AND value < p1 AND p1 < p2
    """,
)
def window_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (MATCH_RECOGNIZE's most common shape,
    expressed portably): find strict V-shapes in each user's value series
    — two consecutive declines followed by two consecutive rises — and
    report the trough with its drop depth and recovery. The
    down-down-up-up pattern over lag/lead is how pattern matching is done
    on engines without MATCH_RECOGNIZE (Spark, DuckDB), and compiles to
    ONE window node (all five frames share the same partition + ordering,
    so Catalyst plans a single sort-and-scan per user partition).

    Scale: one hash shuffle on user_id, per-partition sort by (ts,
    event_id) — the unique tiebreak keeps matches deterministic under
    ties. No self-joins, no per-row Python; 100 TB of events costs
    exactly one window shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 2).over(w).alias("m2"),
        F.lag("value", 1).over(w).alias("m1"),
        F.lead("value", 1).over(w).alias("p1"),
        F.lead("value", 2).over(w).alias("p2"),
    )
    return seq.filter(
        (F.col("m2") > F.col("m1"))
        & (F.col("m1") > F.col("value"))
        & (F.col("value") < F.col("p1"))
        & (F.col("p1") < F.col("p2"))
    ).select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("trough"),
        F.round(F.col("m2") - F.col("value"), 2).alias("drop_depth"),
        F.round(F.col("p2") - F.col("value"), 2).alias("recovery"),
    )


@register(
    "window_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS is_first
      FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(sum(is_first) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS BIGINT) AS distinct_types_so_far
    FROM firsts
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT DISTINCT per user over time (how many distinct
    event types has this user produced so far) — not expressible as a
    distinct window aggregate (distinct doesn't decompose over frames);
    the classic rewrite marks each (user, type)'s FIRST occurrence with
    one row_number window, then a running sum of the markers gives the
    cumulative distinct count exactly.

    Plan: two window passes over the SAME user_id hash partitioning
    (the second sorts a superset of the first's key — one exchange,
    two sorts), no join, no expand. Per-user state in each frame is one
    counter; at 100 TB this is sessionization-priced. The
    discovery-curve primitive (new-items-seen, vocabulary growth)."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    firsts = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return firsts.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("is_first").over(w_run).cast("bigint").alias("distinct_types_so_far"),
    )
