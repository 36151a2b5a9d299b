"""Composite TPC-H-shaped queries (adapted to the fixture schema, which
carries a subset of TPC-H columns — see FIXTURES.md §2).

These exercise multi-operator composition — selective scans feeding
broadcast + shuffle joins into aggregations and top-k — the shapes that
dominate real warehouse workloads and stress the optimizer end to end.
All are stock Catalyst plans; the engine adds no bespoke code here, which
is exactly the point (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table, load_tables
from go_batch_processor_spark.registry import register


@register(
    "tpch_q3_shape",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment filter -> 3-way join -> revenue agg -> top-10.

    Filters reduce each side before the joins (pushdown); the final top-10
    is TakeOrderedAndProject over the aggregated (small) set.
    """
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1998-03-15").cast("timestamp")
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.col("o_orderdate") < cut),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_shipdate") > cut),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_shape",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way star join (2 broadcast dims) + local-supplier
    residual (c_nationkey = s_nationkey) + per-nation revenue.

    Broadcast discipline: nation (25 rows) and region (5 rows) are
    fixed-cardinality — always broadcast. supplier is NOT hinted: it scales
    with SF (TPC-H: SF x 10k rows), so a hard broadcast hint OOMs at 100 TB;
    AQE picks broadcast at small SF and shuffle join at scale on its own.
    """
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    return (
        t["customer"]
        .join(t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"],
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]).filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@register(
    "tpch_q6_shape",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure selective scan-agg — every predicate reaches the parquet
    reader; the ideal plan is a single scan stage with a scalar result."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS with a correlated inequality -> left_semi join with
    the residual predicate, then a tiny count aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    filtered = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    return (
        filtered.join(
            li,
            (filtered.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > filtered.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q18_shape",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM big
    JOIN orders o   ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume orders): the textbook SQL re-joins lineitem
    after the HAVING-filtered aggregate, but the output's
    sum(l_quantity) grouped per order IS the HAVING sum — the group keys
    (custkey, name, orderkey, totalprice) are unique per order — so the
    re-join is redundant: ONE per-order aggregate, filter > 300, then
    join orders + customer. One lineitem scan instead of two (the
    re-join form also needed a fresh scan anyway because of Spark's
    ambiguous-self-join lineage rule); the surviving join input is the
    tiny filtered aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@register(
    "tpch_q10_shape",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top-20."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-07-01").cast("timestamp")
    return (
        t["customer"]
        .join(t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q14_shape",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share (conditional agg over a dim join).

    part scales with SF (SF x 200k rows) — no broadcast hint; AQE broadcasts
    at small SF and falls back to a shuffle join at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "tpch_q7_shape",
    oracle="""
    SELECT n1.n_name AS cust_nation,
           n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping): 4 fact/dim joins plus a DISJUNCTIVE
    cross-dimension residual — revenue between two nations in either
    direction, grouped by direction and ship year.

    Scale: nation is fixed-cardinality (25 rows) so BOTH nation joins are
    broadcast — the disjunction is then a cheap post-join filter that
    Catalyst can't push into either scan (it spans two dims), which is
    exactly what Q7 stresses. The big joins (orders-lineitem-supplier)
    shuffle on their keys; supplier scales with SF so it gets no hint
    (AQE decides, same policy as tpch_q5_shape after round-1 VERDICT #2).
    """
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    rpair = (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-priority audit, adapted: the fixture has no
    l_shipmode so the group key is l_returnflag): fact-fact equi-join with
    the classic CASE-inside-SUM conditional aggregation.

    Scale: the date filter pushes to the lineitem scan; the join shuffles
    both facts on orderkey (no broadcast — both scale with SF); the
    conditional sums are map-side-combined longs, so the agg shuffle is
    O(groups).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q8_shape",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): the deepest join tree in the suite
    — 8 tables, two independent paths to `nation` (customer's nation gates
    the market region; supplier's nation is the share numerator).

    Plan: every dimension (part, customer, both nations, region, supplier)
    broadcasts; lineitem/orders is the only shuffle pair, and the
    region+type filters cut both fact sides before it. The share is a
    conditional-sum ratio per year — one hash aggregate, map-side
    combinable."""
    t = load_tables(
        spark, sf_dir,
        "part", "lineitem", "orders", "customer", "nation", "region", "supplier",
    )
    n1 = t["nation"].alias("n1")
    n2 = t["nation"].alias("n2")
    vol = (
        t["part"].filter(F.col("p_type") == "PROMO")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_shape",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit), adapted: the fixture has no partsupp
    table, so profit is the revenue expression without the supplycost term
    (same join tree and agg shape; TPC-H Q9's ps_supplycost join is the
    only elision). The `%red%` LIKE on p_name cannot push to parquet as a
    range but DOES prune the broadcast part dim before the fact join."""
    t = load_tables(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return (
        t["part"].filter(F.col("p_name").like("%red%"))
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("profit")
        )
    )


@register(
    "tpch_q13_shape",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution), adapted: the comment
    NOT-LIKE filter becomes an o_orderpriority exclusion (no o_comment
    column in the fixture). The LEFT join keeps zero-order customers —
    count(o_orderkey) counts only matched rows, so they land in the
    c_count=0 bucket. Two-level aggregation: per-customer count, then the
    distribution over counts (both hash aggs; the second input is one row
    per customer, already small)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"].join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "tpch_q17_shape",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < pa.qty_lim
    """,
)
def tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (small-quantity-order revenue): the correlated scalar
    subquery (per-part average quantity) is decorrelated into a WINDOW
    over the brand-filtered fact instead of a separate aggregate joined
    back: the brand predicate restricts only WHICH partkeys survive (it
    is a part-side filter), so after the broadcast semi-reduction every
    remaining part still carries ALL its lineitems and the per-part
    window average equals the subquery's. One lineitem scan (the
    agg+join form pays two — and ReuseExchange would not merge them, the
    q15/q21 finding); the window shuffles only brand-matched rows."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "lineitem", "part")
    w = Window.partitionBy("l_partkey")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#23")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .withColumn("qty_lim", F.lit(0.2) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q19_shape",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (disjunctive predicate revenue): three OR-blocks mixing
    part-side and lineitem-side predicates. The disjunction spans both
    join sides, so it must stay a post-join residual — but Catalyst still
    derives the single-side implications (brand IN (...), size <= 35,
    quantity ranges) and pushes THOSE into each scan, the same
    OR-factoring DuckDB applies. One broadcast join, one scalar agg."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    blk = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(blk)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )


@register(
    "tpch_q21_shape",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept waiting), adapted: the fixture has no
    l_receiptdate/l_commitdate, so "late" = shipped more than 60 days
    after the order date (same late-set structure).

    Decorrelated ONE-PASS form instead of the textbook semi+anti joins:
    the NOT EXISTS ("no OTHER supplier late on this order") is exactly
    "all the order's late rows share one suppkey", i.e. min == max over a
    window on the late set — one window pass, no second late subtree
    (which ReuseExchange would not merge; a semi/anti pair re-planned the
    lineitem-orders join twice, 3 lineitem + 2 orders scans total). The
    EXISTS ("some other supplier on the order, late or not") is
    n_supp > 1 from ONE per-order distinct-count over raw lineitem,
    joined on l_orderkey — co-partitioned with the window's shuffle, so
    Catalyst elides the re-exchange. Net: 2 lineitem scans, 1 orders
    scan, same oracle. Measured tradeoff at sf0.1/local[32]: ~0.2 s
    SLOWER than the 3-scan semi+anti form (window + distinct-agg CPU vs
    OS-cached rescans) — the rewrite is chosen because at 100 TB the
    rescans are real I/O and scan count dominates, which is the design
    point this repo optimizes for."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = late.withColumn("_min_ls", F.min("l_suppkey").over(w)).withColumn(
        "_max_ls", F.max("l_suppkey").over(w)
    ).filter(F.col("_min_ls") == F.col("_max_ls"))
    n_supp = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
    )
    return (
        sole_late.join(n_supp, "l_orderkey")
        .filter(F.col("n_supp") > 1)
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22_shape",
    oracle="""
    WITH ab AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c CROSS JOIN ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity), adapted: the phone-prefix
    country code becomes c_nationkey (no c_phone column) and the
    no-orders test becomes no orders SINCE 2000 (every fixture customer
    has some order, which would make the result vacuously empty). Two
    classic sub-shapes: a scalar aggregate (global average balance) joined
    in as a 1-row broadcast — never a collect — and a NOT EXISTS on
    orders as a LEFT ANTI join. The anti join's right side is pruned to
    o_custkey with the date filter pushed into its scan."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    ab = (
        t["customer"].filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q15_shape",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier by quarterly revenue): the classic
    "aggregate consumed twice" query (join input + scalar max that
    re-filters it). Naively building the max as a second aggregate plans
    a SECOND lineitem scan (measured: ReuseExchange does not fire across
    the broadcast-subquery boundary), so the global max is instead an
    empty-partition window ON THE AGGREGATED OUTPUT: the fact table is
    scanned once (pushed-down 3-month filter + 3-column projection) and
    the single-partition exchange the window costs carries only
    O(|suppliers|) already-aggregated rows — at 100 TB that is ~MBs
    moved once versus re-scanning TBs. The revenue is rounded to cents
    on both sides BEFORE the max comparison (registry parity rule:
    order-dependent double sums round at a fixed scale) so the equality
    filter compares identical values in each engine."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        t["supplier"]
        .join(best, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# The fixture schema has no partsupp table; the Q2/Q11/Q16 shapes below
# derive a stand-in from lineitem: one row per distinct (partkey, suppkey)
# pair with min unit price as the supply cost and the pair's lineitem
# count as the stock proxy. Both engines derive it identically, so the
# oracle stays bit-exact; the point is the SHAPES (group-wise min via
# window, global-scalar threshold, distinct-count rollup), which are the
# reason these queries are in the benchmark at all.
_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS ps_supplycost,
         CAST(count(*) AS BIGINT) AS ps_stock
  FROM lineitem GROUP BY 1, 2
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias(
            "ps_supplycost"
        ),
        F.count(F.lit(1)).alias("ps_stock"),
    )


@register(
    "tpch_q2_shape",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_supplycost,
             s.s_acctbal, s.s_name, n.n_name, s.s_suppkey
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           e.ps_supplycost
    FROM part p
    JOIN eu e ON e.ps_partkey = p.p_partkey
    WHERE p.p_size = 15
      AND e.ps_supplycost = (
        SELECT min(e2.ps_supplycost) FROM eu e2
        WHERE e2.ps_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name ASC, e.s_name ASC, p.p_partkey ASC
    LIMIT 10
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): the classic correlated subquery
    "cost = per-part minimum within the region". The correlated min is
    computed ONCE as a window over the region-filtered pair table
    (partitionBy ps_partkey) — the decorrelated form a 100 TB plan needs;
    the naive re-aggregation per probe would rescan the pair table (and
    ReuseExchange would not merge it — the q15 finding). Dims broadcast;
    the pair aggregation is the only fact-sized shuffle; final is a
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "supplier", "nation", "region", "part")
    ps = _derived_partsupp(spark, sf_dir)
    eu = (
        ps.join(
            t["supplier"], F.col("ps_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    best = eu.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        t["part"]
        .filter(F.col("p_size") == 15)
        .join(best, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost"
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(10)
    )


@register(
    "tpch_q11_shape",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    de AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_stock AS value
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'GERMANY'
    ),
    tot AS (SELECT sum(value) AS total FROM de)
    SELECT d.ps_partkey, round(sum(d.value), 2) AS part_value
    FROM de d CROSS JOIN tot
    GROUP BY d.ps_partkey, tot.total
    HAVING sum(d.value) > tot.total * 0.001
    """,
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part inventory value filtered by a
    GLOBAL scalar threshold (fraction of total value in one nation's
    suppliers). The total is a window over the per-part aggregate — one
    pair-table pass feeds both the per-part sums and the global total
    (the aggregate-consumed-twice fix again); nation/supplier dims
    broadcast onto the pair aggregation."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "supplier", "nation")
    ps = _derived_partsupp(spark, sf_dir)
    de = (
        ps.join(t["supplier"], F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "GERMANY")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "ps_partkey", (F.col("ps_supplycost") * F.col("ps_stock")).alias("value")
        )
    )
    per_part = de.groupBy("ps_partkey").agg(F.sum("value").alias("part_value_raw"))
    w = Window.partitionBy()
    return (
        per_part.withColumn("total", F.sum("part_value_raw").over(w))
        .filter(F.col("part_value_raw") > F.col("total") * 0.001)
        .select(
            "ps_partkey", F.round("part_value_raw", 2).alias("part_value")
        )
    )


@register(
    "tpch_q16_shape",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM POLISHED%'
      AND p.p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier-part relationship rollup): distinct supplier
    count per (brand, type, size) with a NOT IN exclusion subquery — the
    exclusion ("suppliers with complaints" in real Q2; negative balance
    here, the fixture has no comment column) lowers to a LEFT ANTI join
    against a tiny filtered supplier list, and the distinct count is the
    standard two-level aggregation."""
    t = load_tables(spark, sf_dir, "supplier", "part")
    ps = _derived_partsupp(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            t["part"].filter(
                (F.col("p_brand") != "Brand#45")
                & (~F.col("p_type").like("MEDIUM POLISHED%"))
                & (F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_shape",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             sum(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
                      THEN l_quantity ELSE 0 END) AS ps_availqty,
             sum(l_quantity) AS total_qty
      FROM lineitem
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_7')
      AND s.s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
          AND ps_availqty > 0.5 * total_qty
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (excess-stock suppliers): the fixture has no partsupp
    table, so ps_availqty is DERIVED deterministically from lineitem —
    availqty(part, supp) := quantity shipped before 1998-07-01 (the data
    midpoint), compared against half the pair's all-time shipped quantity.
    This preserves every structural element of Q20 (nested semi-join
    chain: part name filter -> per-(part,supp) availqty threshold with a
    correlated per-pair aggregate -> supplier semi-join -> nation filter)
    with a predicate of real selectivity, closing the one TPC-H gap
    COVERAGE.md carried since round 2.

    Spark plan: ONE lineitem aggregation computes availqty and the
    correlated total in the same pass (conditional sum — no self-join,
    no second scan; TPC-H's partsupp-vs-lineitem subquery pair collapses
    into a single shuffle), then a broadcast semi against the name-
    filtered parts, a distinct suppkey projection, a semi-join into
    supplier, and a broadcast nation filter. At 100 TB the only wide op
    is the (part, supp) aggregation, which partial-aggregates map-side.
    """
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"),
                    F.col("l_quantity"),
                ).otherwise(F.lit(0.0))
            ).alias("ps_availqty"),
            F.sum("l_quantity").alias("total_qty"),
        )
    )
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select(
        F.col("p_partkey")
    )
    qualified = (
        ps.join(
            F.broadcast(small_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("total_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    return (
        t["supplier"]
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
        )
        .orderBy("s_name")
    )


RRF_K = 60
RRF_POOL = 50
RRF_TOP = 10


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('window', 'merge', 'vector') GROUP BY 1, 2
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks
      WHERE term IN ('window', 'merge', 'vector') GROUP BY 1
    ),
    bm AS (
      SELECT tf.doc_id,
             sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)))
               AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
      GROUP BY tf.doc_id
    ),
    bm_rank AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM bm ORDER BY score DESC, doc_id LIMIT {RRF_POOL}
    ),
    flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    probe AS (SELECT i, v FROM flat WHERE vec_id = 0),
    dots AS (
      SELECT f.vec_id, sum(f.v * p.v) AS dot, sqrt(sum(f.v * f.v)) AS nrm
      FROM flat f JOIN probe p ON f.i = p.i GROUP BY f.vec_id
    ),
    pn AS (SELECT sqrt(sum(v * v)) AS nrm FROM probe),
    cos_rank AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY round(dot / (nrm * (SELECT nrm FROM pn)), 6) DESC,
                                vec_id) AS r
      FROM dots WHERE vec_id <> 0
      ORDER BY round(dot / (nrm * (SELECT nrm FROM pn)), 6) DESC, vec_id
      LIMIT {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
             COALESCE(1.0 / ({RRF_K} + b.r), 0)
           + COALESCE(1.0 / ({RRF_K} + c.r), 0) AS rrf
      FROM bm_rank b FULL OUTER JOIN cos_rank c USING (doc_id)
    )
    SELECT doc_id, round(rrf, 6) AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search via reciprocal-rank fusion (Cormack et al. 2009 —
    the Elasticsearch/OpenSearch hybrid default): fuse the BM25 lexical
    top-50 and the dense-cosine top-50 by Σ 1/(60+rank), no score
    calibration needed (RRF's whole point — ranks are comparable when
    raw scores are not). The retrieval composite every RAG pipeline
    runs.

    Plan: the two retrievers keep their native shapes (BM25:
    query-filtered postings, broadcast stats; dense: one-scan brute
    cosine TakeOrderedAndProject — the IVF-PQ path drops in for the
    dense leg at scale), each emits a RANK-ONLY pool of 50, and the
    fusion is a full-outer join of two 50-row frames — the expensive
    legs never meet each other's data. Determinism: both pool
    boundaries are engine-stable (BM25 ties exact, cosine rounded
    before ordering), and RRF sums two exact rationals."""
    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    from go_batch_processor_spark.operators.similarity import (
        PROBE_VEC_ID,
        cosine_topk,
    )
    from go_batch_processor_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
    )

    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    st = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs"))
    qt = toks.filter(F.col("term").isin(*BM25_QUERY))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qt.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    bm = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
    )
    from pyspark.sql import Window

    bm_rank = (
        bm.orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.partitionBy().orderBy(F.col("score").desc(), "doc_id"))
            .alias("rb"),
        )
    )
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID)
    cos_rank = (
        cosine_topk(emb, probe, RRF_POOL)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(Window.partitionBy().orderBy(F.col("cosine").desc(), "vec_id"))
            .alias("rc"),
        )
    )
    fused = (
        bm_rank.join(cos_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (RRF_K + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("rc")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOP)
        .select("doc_id", F.round("rrf", 6).alias("rrf_score"))
    )


@register("mv_incremental_distinct_hll", tags={"rows_only"})
def mv_incremental_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DISTINCT-COUNT materialized view via mergeable HLL
    sketch state — the missing member of the MV family: counts and sums
    merge by addition (mv_incremental_agg), but COUNT(DISTINCT user)
    does not; the warehouse answer is to store one HLL sketch per
    (day) partition and answer any date-range distinct query by sketch
    UNION, refreshing with only the delta day's sketch.

    Semantics pinned by tests/test_round7e: (a) INCREMENTAL == FULL
    REBUILD bit-exactly — the per-day sketch binary is deterministic for
    deterministic input, so state + delta union equals the from-scratch
    union; (b) the range estimates sit within HLL error of the exact
    distinct counts; (c) refresh touches only the delta day (state rows
    for other days are byte-identical). Rows-only: sketch binaries and
    estimates are engine-specific (DataSketches HLL here; DuckDB's HLL
    is a different implementation), so no SQL oracle can be bit-exact.

    Scale shape: the stored view is O(days) sketch rows (~KB each); the
    refresh scans ONLY the delta partition; range queries merge
    O(days-in-range) sketches with hll_union_agg — the raw user stream
    is never re-shuffled. This is exactly agg_hll_partitioned_merge
    promoted to a maintained view with an incremental-refresh contract.
    """
    ev = load_table(spark, sf_dir, "events")
    cut_day = "2024-01-25"
    cut = F.lit(cut_day).cast("timestamp")

    def day_sketches(df: DataFrame) -> DataFrame:
        return df.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )

    # stored view state (history) + delta refresh (one new day at a time)
    state = day_sketches(ev.filter(F.col("ts") < cut))
    delta = day_sketches(ev.filter(F.col("ts") >= cut))
    view = state.unionByName(delta)  # per-day PK is disjoint by filter
    # range queries over the maintained view: full month + trailing week
    full = view.agg(
        F.lit("all_days").alias("range"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("distinct_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_sketches"),
    )
    tail = view.filter(F.col("d") >= F.lit("2024-01-24").cast("timestamp")).agg(
        F.lit("last_week").alias("range"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("distinct_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_sketches"),
    )
    return full.unionByName(tail)
