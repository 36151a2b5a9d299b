"""Aggregation operators (SURVEY.md §2.2.d).

The reference has no aggregation operators (SURVEY.md §2.1.1 — its Processor
is an opaque black box, /root/reference/batch_processor.go:21-23); these are
part of the declared extension inventory. All are stock Catalyst hash
aggregates: partial (map-side) aggregation happens automatically, so at 100 TB
the shuffle carries only per-group partials, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table, register_views
from go_batch_processor_spark.registry import register


@register(
    "agg_groupby_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter -> hash-agg (8 aggregates, 2 group keys).

    Scale notes: filter + 7-column projection push down to the parquet scan;
    the shuffle carries 6 partial-agg rows per map task (|groups| is tiny),
    so this is scan-bound at any scale factor.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_count",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (Catalyst expands to a two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("agg_approx_distinct", tags={"rows_only"})
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — THE distinct strategy at 100 TB.

    Rows-only check: DuckDB's approx_count_distinct uses a different sketch,
    so values differ by construction (SURVEY.md §2.2.d).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           round(sum(c_acctbal), 2) AS total_bal,
           count(*)                 AS n_cust
    FROM customer
    GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, mktsegment) over customer balances."""
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_nationkey", "c_mktsegment").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*)             AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, user bucket) over event values."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst Expand as cube)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*)                  AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_max_by",
    oracle="""
    SELECT l_returnflag,
           max({'p': l_extendedprice, 'k': l_orderkey}).k AS top_orderkey,
           max({'p': l_extendedprice, 'k': l_orderkey}).p AS top_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max per group via max(struct(value, tiebreak)) — both engines
    order structs lexicographically, so the orderkey tiebreak makes the
    winner deterministic even when the max price ties (plain max_by/arg_max
    is tie-nondeterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    top = F.max(
        F.struct(F.col("l_extendedprice").alias("p"), F.col("l_orderkey").alias("k"))
    )
    return li.groupBy("l_returnflag").agg(
        top.getField("k").alias("top_orderkey"),
        top.getField("p").alias("top_price"),
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT user_id,
           count(*)                                        AS n_all,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS err_value
    FROM events
    GROUP BY user_id
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates (one pass, no self-joins) via
    Spark SQL."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT user_id,
               count(*)                                        AS n_all,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS err_value
        FROM events
        GROUP BY user_id
        """
    )


N_SALTS = 8


def salted_sum_count(df, key: str, value: str, n_salts: int = N_SALTS):
    """Two-phase salted aggregation for skewed group keys.

    Phase 1 groups on (key, random-ish salt) so a hot key's rows spread over
    n_salts reducers; phase 2 re-aggregates the n_salts partials per key.
    The salt must be deterministic for reproducibility — derived from a row
    identity hash, not rand(). Sum/count compose across phases exactly;
    avg = sum/count at the end (never average partial averages).
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("_sum"), F.sum("_c").alias("_cnt")
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           round(sum(value), 2) AS total_value,
           count(*)             AS n,
           round(sum(value) / count(*), 4) AS mean_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation via salting (event_type has only 5 values
    — exactly the hot-key shape where a plain groupBy funnels everything
    through 5 reducers at 100 TB). Result is identical to the plain
    groupBy; only the shuffle topology differs.

    Note: Spark's map-side partial aggregation already absorbs most of this
    for algebraic aggregates; explicit salting is the pattern for when
    partials don't compose (exact distinct, collect) or under AQE-resistant
    skew."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_sum_count(ev, "event_type", "value")
    return out.select(
        "event_type",
        F.round(F.col("_sum"), 2).alias("total_value"),
        F.col("_cnt").alias("n"),
        F.round(F.col("_sum") / F.col("_cnt"), 4).alias("mean_value"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           count(*)                  AS n_orders,
           round(sum(o_totalprice), 2) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 5
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — a filter above the agg node."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") > 5)
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via bitmaps: map each user_id to a
    (bucket, bit-position) pair, OR the bits into one bitmap per
    (group, bucket) — a partial-aggregatable, map-side-combinable
    state — then sum popcounts per group.

    Scale rationale: `count(DISTINCT x)` forces Spark to keep/shuffle the
    distinct key set (Expand + two-phase aggregate over the raw values);
    the bitmap state is instead a fixed 4 KB page per 32768-id bucket that
    merges with bitwise OR, so the shuffle volume is bounded by the id
    RANGE, not the row count — the classic roaring-bitmap warehouse trick,
    exact where HLL (`agg_approx_distinct`) is approximate.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("_bkt"),
            F.bitmap_bit_position("user_id").alias("_pos"),
        )
        .groupBy("event_type", "_bkt")
        .agg(F.bitmap_construct_agg("_pos").alias("_bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("_bm")).cast("bigint").alias("n_users")
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           sum(CAST(l_extendedprice AS DECIMAL(18, 2)))      AS total_price,
           sum(CAST(l_discount AS DECIMAL(8, 2)))            AS total_discount,
           CAST(count(*) AS BIGINT)                          AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal (money) aggregation: prices cast to DECIMAL(18,2)
    BEFORE summing, so the sum is exact integer-cents arithmetic in both
    engines — no floating rounding, no round() in the oracle, bit-exact
    by construction. This is the correctness surface a billing pipeline
    needs; the double-based aggregates elsewhere trade exactness for
    codegen speed and pin parity via fixed-scale rounding instead
    (registry docstring rules).

    Scale note: Spark decimal sums use 128-bit accumulators inside the
    same partial-combinable hash aggregate — shuffle stays O(groups);
    decimal math is ~2-3x slower per row than double, the classic
    exactness/speed trade a finance workload accepts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("total_price"),
        F.sum(F.col("l_discount").cast("decimal(8,2)")).alias("total_discount"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT event_type, val_mode, n FROM (
      SELECT event_type, val AS val_mode, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, val ASC) AS rn
      FROM (
        SELECT event_type, round(value, 0) AS val,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
      )
    ) WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group: count-then-pick
    with an explicit (count DESC, value ASC) tiebreak. Built-in mode()
    returns an ARBITRARY element among tied candidates in both engines —
    unusable under a value-hash correctness gate, and a real
    reproducibility bug in pipelines; the two-aggregate formulation costs
    one extra |groups x distinct-values| shuffle and is exactly
    reproducible. Values are rounded to integers first so the mode is
    over a meaningful (non-unique) domain."""
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy(
        "event_type", F.round("value", 0).alias("val")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("val").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("val").alias("val_mode"), "n")
    )


@register(
    "agg_bitmap_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT)                       AS n_click,
           CAST((SELECT count(*) FROM b) AS BIGINT)                      AS n_purchase,
           CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
                AS BIGINT)                                               AS n_union,
           CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
                AS BIGINT)                                               AS n_intersect
    """,
)
def agg_bitmap_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-set arithmetic via mergeable bitmaps: how many users
    clicked, how many purchased, and how many did BOTH — computed with
    inclusion-exclusion over bitmap pages (|A∩B| = |A| + |B| − |A∪B|)
    instead of a distinct-set join.

    Scale rationale: the naive plan (two `count(DISTINCT)` plus an
    INTERSECT of distinct sets) shuffles the raw user-id sets twice. Here
    each (event_type, 32768-id bucket) collapses map-side into one 4 KB
    bitmap page; per-bucket the two pages OR together for the union count,
    and the three popcounts travel as three BIGINTs. Shuffle volume is
    bounded by the id RANGE (pages), not the row count — and every state
    is mergeable, so the same plan runs as an incremental/streaming
    rollup. This is the roaring-bitmap audience-overlap pattern used by
    ClickHouse/Druid for exact segment intersection at web scale.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("_bkt"),
        F.bitmap_bit_position("user_id").alias("_pos"),
    )
    pages = base.groupBy("_bkt", "event_type").agg(
        F.bitmap_construct_agg("_pos").alias("_bm")
    )
    per_bucket = pages.groupBy("_bkt").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.bitmap_count("_bm"))
        ).alias("_ca"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.bitmap_count("_bm"))
        ).alias("_cb"),
        F.bitmap_count(F.bitmap_or_agg("_bm")).alias("_cu"),
    )
    return per_bucket.agg(
        F.coalesce(F.sum("_ca"), F.lit(0)).cast("bigint").alias("n_click"),
        F.coalesce(F.sum("_cb"), F.lit(0)).cast("bigint").alias("n_purchase"),
        F.coalesce(F.sum("_cu"), F.lit(0)).cast("bigint").alias("n_union"),
        (
            F.coalesce(F.sum("_ca"), F.lit(0))
            + F.coalesce(F.sum("_cb"), F.lit(0))
            - F.coalesce(F.sum("_cu"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_intersect"),
    )


KMV_K = 256
_HEX = "0123456789abcdef"


def _kmv_u(engine: str) -> str:
    """Exact dyadic md5 uniform over user_id — identical bit pattern in
    Spark SQL and DuckDB (divisors cast to double: a bare decimal
    divisor truncates to 6 digits in Spark, see operators/text.py)."""
    if engine == "spark":
        h, pos = "md5(cast(user_id as string))", "instr"
    else:
        h, pos = "md5(CAST(user_id AS VARCHAR))", "strpos"
    return " + ".join(
        f"({pos}('{_HEX}', substring({h}, {i}, 1)) - 1)"
        f" / cast({16 ** i} as double)"
        for i in range(1, 9)
    )


@register(
    "agg_kmv_theta_intersect",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)    AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY user_id
    ),
    h AS (SELECT user_id, in_a, in_b, {_kmv_u('duck')} AS u FROM users),
    m AS (SELECT * FROM h ORDER BY u, user_id LIMIT {KMV_K})
    SELECT CAST({KMV_K} AS BIGINT) AS k,
           CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
                     ELSE round(({KMV_K} - 1) / max(u)) END AS BIGINT)
             AS est_union,
           round(sum(in_a * in_b) / CAST(count(*) AS DOUBLE), 6)
             AS jaccard_est,
           CAST(CASE WHEN count(*) < {KMV_K} THEN sum(in_a * in_b)
                     ELSE round((sum(in_a * in_b)
                                 / CAST(count(*) AS DOUBLE))
                                * (({KMV_K} - 1) / max(u))) END AS BIGINT)
             AS est_intersect
    FROM m
    """,
)
def agg_kmv_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set intersection via KMV (k-minimum-values,
    Beyer et al. SIGMOD'07 / DataSketches theta): keep the k smallest
    content-hashes of the union; |A∪B| ≈ (k−1)/u_(k); Jaccard ≈ the
    fraction of those k samples belonging to both sets (any union-k
    sample that is in A is necessarily within A's own k smallest, so
    sketch-side membership is exact); |A∩B| = Ĵ·Û.

    This is the sketch HLL inclusion-exclusion CANNOT provide: the
    error scales with the Jaccard, not with |A∪B|/|A∩B|, so tiny
    overlaps of huge sets stay accurate (the documented caveat on
    agg_hll_intersection). Deterministic md5 hashing makes it fully
    ORACLED — same sketch, same estimate, both engines; sets smaller
    than k degrade to exact counts by construction.

    Plan: one scan -> per-user flags (partial-combinable max), then a
    global top-k by hash = TakeOrderedAndProject (per-partition k-min
    then merge — exactly the KMV merge rule, so the same plan IS the
    distributed sketch union at 100 TB; k·|partitions| values cross)."""
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    m = (
        users.withColumn("u", F.expr(_kmv_u("spark")))
        .orderBy("u", "user_id")
        .limit(KMV_K)
    )
    exact = F.count(F.lit(1)) < KMV_K
    est_union = F.when(exact, F.count(F.lit(1))).otherwise(
        F.round((KMV_K - 1) / F.max("u"))
    )
    jac = F.sum(F.col("in_a") * F.col("in_b")) / F.count(F.lit(1)).cast("double")
    return m.agg(
        F.lit(KMV_K).cast("bigint").alias("k"),
        est_union.cast("bigint").alias("est_union"),
        F.round(jac, 6).alias("jaccard_est"),
        F.when(exact, F.sum(F.col("in_a") * F.col("in_b")))
        .otherwise(F.round(jac * ((KMV_K - 1) / F.max("u"))))
        .cast("bigint")
        .alias("est_intersect"),
    )


TD_DELTA = 400  # centroid budget per digest => rank error <= 1/(2*delta)
TD_QS = (0.01, 0.25, 0.5, 0.9, 0.99)


def _td_compress(means, weights, delta):
    """Merge (mean, weight) centroids into <= delta centroids with the
    k0 (equal-weight-cap) scale function: uniform rank-error bound
    1/(2*delta) at every quantile. Stable sort keeps merging
    deterministic for tied means."""
    import numpy as np

    order = np.argsort(means, kind="mergesort")
    m, w = means[order], weights[order]
    total = float(w.sum())
    cap = total / delta
    out_m: list = []
    out_w: list = []
    cur_m, cur_w = float(m[0]), float(w[0])
    for i in range(1, len(m)):
        wi = float(w[i])
        if cur_w + wi <= cap:
            cur_w += wi
            cur_m += (float(m[i]) - cur_m) * wi / cur_w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cur_m, cur_w = float(m[i]), wi
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


@register("agg_tdigest_quantiles", oracle=None, tags={"rows_only"})
def agg_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest quantile sketch (Dunning & Ertl) as a
    two-level Arrow pipeline: every partition streams its values into
    a local digest (buffer 128k raw values, compress into O(delta)
    weighted centroids — strictly < 2*delta+1 by the k0 cap argument,
    and exact for tiny inputs; bounded memory regardless of partition
    size),
    then one merge task unions all partial digests and interpolates the
    requested quantiles from cumulative centroid weights.

    Why it exists next to approx_percentile: the sketch itself is the
    deliverable — per-partition digests are REUSABLE mergeable state
    (persist them per day/segment, answer any quantile later by digest
    union without rescanning), which is the 100 TB pattern
    approx_percentile's opaque internal buffer can't give you. Shuffled
    state: delta * |partitions| centroids, corpus-independent; the
    single merge group is that same bounded set, never raw data.
    Accuracy pinned in tests/test_sketches.py: rank error vs the exact
    CDF <= 1% at every reported quantile (k0 bound: 1/(2*400))."""
    import numpy as np
    import pandas as pd

    delta, qs = TD_DELTA, TD_QS

    def partial(batches):
        buf: list = []
        dig_m = np.empty(0)
        dig_w = np.empty(0)

        def flush():
            nonlocal dig_m, dig_w, buf
            vals = np.concatenate([dig_m] + buf) if buf else dig_m
            wts = np.concatenate([dig_w] + [np.ones(len(b)) for b in buf])
            m, w = _td_compress(vals, wts, delta)
            dig_m, dig_w = np.asarray(m), np.asarray(w)
            buf = []

        n_buf = 0
        for pdf in batches:
            v = pdf["v"].to_numpy(dtype=float)
            if len(v):
                buf.append(v)
                n_buf += len(v)
            if n_buf >= 131072:
                flush()
                n_buf = 0
        if buf:
            flush()
        if len(dig_m):
            yield pd.DataFrame({"m": dig_m, "w": dig_w})

    def merge(key, pdf):
        m, w = _td_compress(
            pdf["m"].to_numpy(dtype=float), pdf["w"].to_numpy(dtype=float), delta
        )
        m_arr, w_arr = np.asarray(m), np.asarray(w)
        total = w_arr.sum()
        cum = np.cumsum(w_arr) - w_arr / 2.0
        ests = np.interp([q * total for q in qs], cum, m_arr)
        return pd.DataFrame(
            {"q": qs, "est": np.round(ests, 4), "n": int(round(total))}
        )

    li = load_table(spark, sf_dir, "lineitem")
    partials = li.select(F.col("l_extendedprice").alias("v")).mapInPandas(
        partial, "m double, w double"
    )
    return (
        partials.groupBy(F.lit(1).alias("g"))
        .applyInPandas(merge, "q double, est double, n long")
    )


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # buckets per row (two md5 hex nibbles)
CMS_TOP = 10  # report the top-N hottest keys


@register(
    "agg_count_min_sketch",
    oracle=f"""
    WITH keyed AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells AS (
      SELECT i.i AS i,
             (strpos('0123456789abcdef',
                     substr(md5(i.i || ':' || k), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(i.i || ':' || k), 2, 1)) - 1) AS bucket,
             CAST(count(*) AS BIGINT) AS cell_n
      FROM keyed, (SELECT unnest(range({CMS_DEPTH})) AS i) i
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT k, CAST(count(*) AS BIGINT) AS true_n
      FROM keyed GROUP BY k
    ),
    est AS (
      SELECT t.k, t.true_n, min(c.cell_n) AS cms_est
      FROM truth t, (SELECT unnest(range({CMS_DEPTH})) AS i) i
      JOIN cells c
        ON c.i = i.i
       AND c.bucket = (strpos('0123456789abcdef',
                              substr(md5(i.i || ':' || t.k), 1, 1)) - 1) * 16
                      + (strpos('0123456789abcdef',
                                substr(md5(i.i || ':' || t.k), 2, 1)) - 1)
      GROUP BY t.k, t.true_n
    )
    SELECT k, true_n, cms_est,
           CAST(cms_est - true_n AS BIGINT) AS overestimate
    FROM est
    ORDER BY true_n DESC, k ASC
    LIMIT {CMS_TOP}
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    frequency estimation, built explicitly from {CMS_DEPTH} md5 hash
    rows × {CMS_WIDTH} buckets so the sketch itself is a DataFrame and
    the one-sided error guarantee (estimate ≥ truth, overshoot ≤ εN
    w.h.p.) is CHECKABLE against the exact counts in the same query —
    the output carries both. Content-stable md5 bucketing keeps the
    sketch identical on any engine or partitioning (deterministic, so
    the whole pipeline is DuckDB-oracled — rare for a sketch operator;
    agg_count_min_topk is the production JVM-hash sibling whose
    guarantees are pytest-pinned instead).

    Scale shape: the build is one explode({CMS_DEPTH}) + one
    partial-combinable (row, bucket) count — per-partition state
    collapses to ≤{CMS_DEPTH}×{CMS_WIDTH} cells BEFORE the shuffle, so
    a 100 TB stream shuffles ~1k rows per partition regardless of key
    cardinality (this is why CMS exists). The probe side re-derives
    each key's buckets and joins the ≤1k-cell sketch as a BROADCAST;
    the exact `truth` counts here are only the verification harness —
    a production probe touches the sketch alone.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    hexa = F.lit("0123456789abcdef")

    def bucket(i_col, k_col):
        h = F.md5(F.concat(i_col.cast("string"), F.lit(":"), k_col))
        return (
            (F.instr(hexa, F.substring(h, 1, 1)) - 1) * 16
            + (F.instr(hexa, F.substring(h, 2, 1)) - 1)
        ).cast("bigint")

    rows = keyed.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i")
    )
    cells = rows.groupBy(
        F.col("i").cast("bigint").alias("i"),
        bucket(F.col("i"), F.col("k")).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cell_n"))

    truth = keyed.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    probe = truth.select(
        "k",
        "true_n",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("i"),
    ).select(
        "k",
        "true_n",
        F.col("i").cast("bigint").alias("i"),
        bucket(F.col("i"), F.col("k")).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("k", "true_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return (
        est.select(
            "k",
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).cast("bigint").alias(
                "overestimate"
            ),
        )
        .orderBy(F.col("true_n").desc(), F.col("k").asc())
        .limit(CMS_TOP)
    )


@register(
    "agg_median_distributed",
    oracle="""
    WITH cents AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(median(CAST(c AS DOUBLE)) / 100.0, 4) AS median_price
    FROM cents
    """,
)
def agg_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of l_extendedprice computed WITHOUT any
    single-task sort or window — the 100 TB path for exact order
    statistics, registered as its own key so the scale recipe is
    driver-verified rather than just documented.

    Shape (r10 rewrite — approxQuantile BAND ISOLATION): the previous
    form compressed raw rows to the distinct-cents marginal and ran a
    3-pass distributed cumsum over it; measured at sf0.1 the marginal
    is 583k distinct of 600k rows — prices are NEAR-UNIQUE, so that
    groupBy was a full shuffle for ~1x compression and the key sat at
    4.6 s in-bench for three rounds. Now:

    (1) one `approxQuantile` pass over the raw cents brackets the
        median: with relativeError eps, the values reported for
        quantiles (p_lo, p_hi) = (lo/n - 4eps, hi/n + 4eps) have TRUE
        ranks provably outside [lo, hi], so the target order
        statistics lie inside the band [m_lo, m_hi] regardless of how
        the sketch merged (rank-error guarantee, not luck — the result
        below is therefore deterministic even though the band
        endpoints may vary run to run);
    (2) one aggregate pass labels every row: below-band collapses to
        the sentinel -1 (cents of a positive price are >= 1), in-band
        keeps its cent value, above-band drops — so the groupBy
        shuffles ~one row per (partition x distinct-band-value):
        partial aggregation swallows the below-band mass map-side;
    (3) the band marginal (<= ~8eps*n + 1 rows, BOUNDED by
        construction) gets one ordered cumulative window — the -1
        sentinel sorts first, contributing the below-band offset
        exactly — and the two middle ranks select their values. If the
        sketch guarantee were ever violated the rank predicates find
        no row and the median comes back NULL: a loud parity failure,
        never a silently wrong value.

    Measured sf0.1 warm: 3.4-4.2 s -> ~1.3 s (2 raw scans, no full
    shuffle, no checkpoint). At 100 TB the band is the only state that
    must stay small: eps should scale ~target_band/(8n) (1e-6 caps the
    band at ~8M rows per trillion); the GK sketch per partition grows
    ~O(1/eps log(eps n)) — if that ever dominates, recurse: band-pass
    once at coarse eps, then exact-select inside the band.

    Parity: cents are exact integers; the even-count average of the
    two middle values is an exact .5-cent dyadic; round(4) after /100
    is display-only."""
    # n from the parquet footer (driver-side pyarrow metadata, no Spark
    # job; the spearman regime-probe pattern).
    from go_batch_processor_spark.catalog import table_row_count

    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    n = table_row_count(sf_dir, "lineitem")
    lo, hi = (n + 1) // 2, (n + 2) // 2
    eps = 0.001
    p_lo = max(0.0, lo / n - 4 * eps)
    p_hi = min(1.0, hi / n + 4 * eps)
    m_lo, m_hi = li.approxQuantile("c", [p_lo, p_hi], eps)
    band = (
        li.select(
            F.when(F.col("c") < m_lo, F.lit(-1))
            .when(F.col("c") <= m_hi, F.col("c"))
            .alias("v")
        )
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # One-task window over the BOUNDED band marginal only (never the
    # corpus): the -1 group's cnt is the exact below-band row count.
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = band.withColumn("cum", F.sum("cnt").over(w_cum))
    return cum.where(F.col("v") >= 0).agg(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(
            (
                F.min(F.when(F.col("cum") >= lo, F.col("v")))
                + F.min(F.when(F.col("cum") >= hi, F.col("v")))
            ).cast("double")
            / 2.0
            / 100.0,
            4,
        ).alias("median_price"),
    )
