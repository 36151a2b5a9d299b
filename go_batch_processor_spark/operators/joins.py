"""Join operators (SURVEY.md §2.2.c).

The reference has no joins (SURVEY.md §2.1.1); extension inventory. All
standard joins are stock Catalyst — the engine's job is picking the right
physical shape for 100 TB:

  - fact x fact      -> sort-merge / shuffled hash on the equi key (AQE may
                        convert to broadcast at runtime if a side is small);
  - fact x small dim -> explicit ``F.broadcast`` hint: no shuffle of the fact;
  - semi/anti        -> ``left_semi`` / ``left_anti`` (never join+distinct);
  - as-of            -> no native Spark primitive; implemented below as a
                        union + window ``last(ignorenulls)`` pass: ONE shuffle
                        on the by-key, no range explosion, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time: tuple[str, str],
    by: tuple[str, str] | None,
    value_cols: list[str],
    how: str = "inner",
    tolerance_s: int | None = None,
    salt_time: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row whose time
    is <= the left row's time (inclusive), optionally per by-key.
    ``direction="forward"`` flips the semantics to the EARLIEST right row at
    or after the left time (pandas merge_asof's ``direction`` parameter): both
    time columns are negated as exact epoch-micros longs (double-free, so
    micro ordering survives) and the identical backward machinery runs —
    every path (keyed window, keyless bucketing, hot-key salting, tolerance)
    inherits for free. Time columns must be TimestampType in forward mode.

    Algorithm (scalable; no per-row range scan, no broadcast of the right):
      1. tag left rows ``_is_left=1`` and right rows ``_is_left=0``;
      2. union on (by-key, time, right value columns, left payload);
      3. window per by-key ordered by (time, _is_left): running
         ``last(value, ignorenulls=True)`` carries the latest right value
         forward onto each left row — right sorts before left at equal
         times, making the match inclusive;
      4. keep left rows; ``how='inner'`` drops left rows with no prior match.

    ``tolerance_s`` (like pandas merge_asof tolerance): discard matches whose
    right time lies more than that many seconds before the left time.

    Cost: one shuffle + sort on the by-key — the same cost as a sort-merge
    join, independent of time-range density. At 100 TB the window state per
    key is O(1) (only the carried values), so no skew blowup beyond ordinary
    hot-key skew. For a HOT key (one key holding a large share of rows, so
    its window partition becomes a single straggler task), pass
    ``salt_time=True``: the carry then runs per (key, time-bucket) with a
    per-key O(#buckets) carry-in table — the same two-pass scheme as the
    keyless path, splitting each hot key across ~4x-parallelism tasks
    (tests/test_asof_property.py asserts the plan and the parity).
    """
    if direction == "forward":
        lt, rt = on_time
        # negate exact epoch-micros so "latest -t_r <= -t_l" == "earliest
        # t_r >= t_l"; inclusive-at-equality carries over, and the
        # tolerance check (_t - __rt) becomes t_r - t_l, i.e. the forward
        # gap — scaled to micros to keep the units consistent.
        out = asof_join(
            left.withColumn("_negt", -F.unix_micros(F.col(lt))),
            right.withColumn("_negt", -F.unix_micros(F.col(rt))),
            on_time=("_negt", "_negt"),
            by=by,
            value_cols=value_cols,
            how=how,
            tolerance_s=tolerance_s * 1_000_000 if tolerance_s is not None else None,
            salt_time=salt_time,
        )
        return out.drop("_negt")

    lt, rt = on_time
    lkey, rkey = by if by else (None, None)

    lsel: list[Column] = [F.col(lt).alias("_t"), F.lit(1).alias("_is_left")]
    rsel: list[Column] = [F.col(rt).alias("_t"), F.lit(0).alias("_is_left")]
    if by:
        lsel.append(F.col(lkey).alias("_k"))
        rsel.append(F.col(rkey).alias("_k"))
    for c in left.columns:
        lsel.append(F.col(c))
        rsel.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
    carry = list(value_cols)
    if tolerance_s is not None and "__rt" not in carry:
        # carry the matched right time itself for the tolerance check
        lsel.append(F.lit(None).cast(right.schema[rt].dataType).alias("_v___rt"))
        rsel.append(F.col(rt).alias("_v___rt"))
        carry.append("__rt")
    for c in value_cols:
        lsel.append(F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}"))
        rsel.append(F.col(c).alias(f"_v_{c}"))

    unioned = left.select(*lsel).unionByName(right.select(*rsel))

    if by and not salt_time:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*",
            *[
                F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
                for c in carry
            ],
        )
    else:
        carried = _bucketed_asof_carry(
            unioned, carry, group_cols=["_k"] if by else []
        )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        out = out.filter(
            F.col("_asof___rt").isNotNull()
            & (
                (F.col("_t").cast("long") - F.col("_asof___rt").cast("long"))
                <= tolerance_s
            )
        )
    out = out.select(
        *left.columns, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols]
    )
    if how == "inner":
        matched = F.lit(True)
        for c in value_cols:
            matched = matched & F.col(f"asof_{c}").isNotNull()
        out = out.filter(matched)
    return out


def _bucketed_asof_carry(
    unioned: DataFrame, carry: list[str], group_cols: list[str]
) -> DataFrame:
    """Time-bucketed as-of carry: the keyless path and the hot-key salt.

    With ``group_cols=[]`` (keyless, ``by=None``) a naive global window
    (``Window.partitionBy(F.lit(0))``) would funnel every row through ONE
    task; with ``group_cols=["_k"]`` (``salt_time=True``) a hot key's
    window partition would be a single straggler task. Either way the fix
    is the same two-pass scheme over a range-bucketed time axis:

      1. bucket rows by ``floor((t - tmin) / width)`` where tmin/tmax come
         from a 1-row in-plan aggregate (broadcast, no driver action) and
         width targets ~4 buckets per core;
      2. per-(group, bucket) carry-in table: PER-COLUMN latest non-null
         right values of each bucket (max_by over rows where that column
         is non-null — a NULL on the bucket's latest right row must not
         mask an earlier value, matching the keyed path's per-column
         last(ignorenulls)), prefix-carried across buckets with a window
         over the O(#groups x #buckets) bucket table (bounded — NOT
         O(rows));
      3. per-(group, bucket) windowed ``last(ignorenulls)`` seeded by the
         carry-in via ``coalesce``.

    Equal-time semantics match the plain keyed path: a right row at the
    same timestamp as a left row lands in the same bucket and sorts first
    (``_is_left`` tiebreak), and carry-in only covers strictly earlier
    buckets. The keyless carry-in is a broadcast (O(#buckets) rows); the
    salted carry-in joins on (key, bucket) — co-partitioned with the
    step-3 window, and Spark may still broadcast it when small.
    """
    sc = unioned.sparkSession.sparkContext
    n_buckets = sc.defaultParallelism * 4
    tl = F.col("_t").cast("long")
    stats = unioned.agg(F.min(tl).alias("_tmin"), F.max(tl).alias("_tmax"))
    width = F.greatest(
        F.floor((F.col("_tmax") - F.col("_tmin") + 1) / n_buckets), F.lit(1)
    )
    u = (
        unioned.crossJoin(F.broadcast(stats))
        .withColumn("_bkt", F.floor((tl - F.col("_tmin")) / width))
        .drop("_tmin", "_tmax")
    )
    gb = [*group_cols, "_bkt"]

    last_per_bucket = (
        u.filter(F.col("_is_left") == 0)
        .groupBy(*gb)
        .agg(
            *[
                F.max_by(
                    F.col(f"_v_{c}"),
                    F.when(F.col(f"_v_{c}").isNotNull(), F.col("_t")),
                ).alias(f"_ls_{c}")
                for c in carry
            ]
        )
    )
    # Every (group, bucket) present in the data gets a carry-in row, even
    # buckets holding only left rows (their carry comes from the nearest
    # earlier bucket of the same group that had right rows).
    bucket_tbl = u.select(*gb).distinct().join(last_per_bucket, gb, "left")
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = bucket_tbl.select(
        *gb,
        *[
            F.last(f"_ls_{c}", ignorenulls=True).over(wb).alias(f"_carry_{c}")
            for c in carry
        ],
    )
    if not group_cols:
        carry_in = F.broadcast(carry_in)

    w = (
        Window.partitionBy(*gb)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return u.join(carry_in, gb, "left").select(
        "*",
        *[
            F.coalesce(
                F.last(f"_v_{c}", ignorenulls=True).over(w),
                F.col(f"_carry_{c}"),
            ).alias(f"_asof_{c}")
            for c in carry
        ],
    )


@register(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inner equi-join orders x customer (shuffle join; AQE may
    broadcast the customer side at small SF)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins with explicit broadcast hints — at 100 TB the
    fact side never shuffles for fixed-cardinality dims (nation=25, region=5)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, order columns null when unmatched."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi — right side reduced to keys before the join,
    output never duplicates left rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey, p_size, l_quantity
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity < p_size
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual: Catalyst joins on the equi part and applies
    the range predicate as a post-join filter — never a cartesian product."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return li.join(
        p, (li.l_partkey == p.p_partkey) & (li.l_quantity < p.p_size), "inner"
    ).select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")


RANGE_WINDOW_S = 300  # pair events within 5 minutes


@register(
    "join_range_time_bucketed",
    oracle=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           date_diff('second', a.ts, b.ts) AS diff_s
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(date_diff('second', a.ts, b.ts)) <= {RANGE_WINDOW_S}
    """,
)
def join_range_time_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (same-user event pairs within 5 minutes) via the
    bucket trick: floor timestamps to 5-min buckets, explode ONE side to its
    {{b-1, b, b+1}} neighbor buckets, equi-join on (user, bucket), filter the
    exact range residual.

    This turns an O(n^2-per-key) range join into an equi-join whose fanout
    is bounded by events-per-bucket — the standard candidate-generation
    shape at 100 TB (the DuckDB oracle brute-forces the same semantics).
    Exploding only one side guarantees each qualifying pair matches exactly
    once (the other side's home bucket is unique).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.col("ts").cast("long").alias("epoch_s")
    )
    bucket = F.floor(F.col("epoch_s") / RANGE_WINDOW_S)
    left = ev.select(
        F.col("event_id").alias("event_a"),
        F.col("user_id").alias("u"),
        F.col("epoch_s").alias("ea"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("jb"),
    )
    right = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("u2"),
        F.col("epoch_s").alias("eb"),
        bucket.alias("jb2"),
    )
    diff = F.col("eb") - F.col("ea")
    return (
        left.join(
            right,
            (F.col("u") == F.col("u2"))
            & (F.col("jb") == F.col("jb2"))
            & (F.col("event_a") < F.col("event_b")),
        )
        .filter(F.abs(diff) <= RANGE_WINDOW_S)
        .select("event_a", "event_b", diff.alias("diff_s"))
    )


SALT_BUCKETS = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: salt the (hot-keyed) fact side, replicate the
    dim side across all salts, join on (key, salt).

    A plain shuffle join hashes ALL rows of a hot key into one task —
    the straggler pattern AQE's skew-join splitting also targets at
    runtime. Explicit salting is the deterministic version: each hot key
    spreads over SALT_BUCKETS tasks at the cost of replicating the
    (small) build side SALT_BUCKETS times. Use when the skew is known and
    stable (user/tenant keys in event logs — exactly this shape); rely on
    AQE when it is not.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    replicated = c.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return salted.join(
        replicated,
        (salted.user_id == replicated.c_custkey)
        & (salted._salt == replicated._salt),
    ).select("event_id", "user_id", "c_name", "c_mktsegment")


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides written with
    ``bucketBy(8, join_key)`` + ``sortBy``, then joined — Spark's bucketed
    scan reports hash-partitioned, sorted output, so the sort-merge join
    runs with ZERO exchanges (tests assert no Exchange in the plan).

    This is THE layout lever for repeated big-fact joins at 100 TB: pay
    the partitioning once at write time, never shuffle at read time. The
    write cost amortizes across every downstream join/aggregate on the
    bucket key. Table names are FIXED with mode("overwrite") so repeated
    runs reuse the same warehouse paths instead of accumulating one
    app-id-keyed copy of orders+customer per application (the overwrite
    reclaims the previous run's files). Trade-off: two sessions running
    this exact query concurrently would race on the table — acceptable
    for a demo query whose tables are scratch layout, and the production
    pattern is a real, owned bucketed table written once anyway.
    """
    t_orders = "gbp_bkt_orders"
    t_cust = "gbp_bkt_customer"
    for t in (t_orders, t_cust):
        # Reclaim BOTH forms of leftover: a live catalog entry from this
        # process (DROP also removes the managed location) and a stale
        # warehouse directory orphaned by a previous process whose
        # in-memory catalog died with it (saveAsTable refuses to create a
        # managed table over an existing location). The Hadoop FS API
        # keeps this portable to HDFS/S3A warehouses.
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir") + "/" + t
        )
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(path, True)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(t_orders)
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(t_cust)
    )
    ob = spark.table(t_orders)
    cb = spark.table(t_cust)
    return ob.join(cb, ob.o_custkey == cb.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )


BAND_CENTS = 5  # |value difference| <= 0.05, in exact integer cents


@register(
    "join_band_inequality",
    oracle=f"""
    WITH e AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    )
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           b.cents - a.cents AS diff_cents
    FROM e a JOIN e b
      ON a.event_id < b.event_id
     AND abs(a.cents - b.cents) <= {BAND_CENTS}
    """,
)
def join_band_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INEQUALITY-ONLY join — no natural equi key anywhere in the predicate
    (pairs of events whose values lie within a 5-cent band). Catalyst's only
    native strategy for this is BroadcastNestedLoopJoin / cartesian — O(n^2)
    and a non-starter at 100 TB.

    The IEJoin-style fix MANUFACTURES an equi key: quantize the value axis
    into band-width buckets, explode ONE side to its {{b-1, b, b+1}} neighbor
    buckets, equi-join on the bucket, then apply the exact band residual.
    Work becomes O(n x per-bucket density) and shuffles hash-partition on
    the bucket — the same candidate-generation shape as the time-range join
    (join_range_time_bucketed), applied to a value axis.

    Arithmetic is in integer cents (values are 2-decimal): float bucket
    boundaries could disagree between the two sides by 1 ulp and silently
    drop boundary pairs; integers cannot.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    bucket = F.floor(F.col("cents") / BAND_CENTS)
    left = ev.select(
        F.col("event_id").alias("event_a"),
        F.col("cents").alias("ca"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("jb"),
    )
    right = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("cents").alias("cb"),
        bucket.alias("jb2"),
    )
    return (
        left.join(
            right,
            (F.col("jb") == F.col("jb2")) & (F.col("event_a") < F.col("event_b")),
        )
        .filter(F.abs(F.col("ca") - F.col("cb")) <= BAND_CENTS)
        .select("event_a", "event_b", (F.col("cb") - F.col("ca")).alias("diff_cents"))
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on_time: tuple[str, str],
    by: tuple[str, str],
    value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Alternative as-of strategy for a SMALL right side: pack the right
    table into a per-key sorted array of (time, values) structs, broadcast
    it, and pick the last element <= t with JVM array functions.

    Zero shuffles on the left side (vs one shuffle+sort for the union+window
    strategy) at the cost of O(right rows per key) work per left row — the
    right choice when the right side is dimension-sized and the left is the
    100 TB fact. Same contract as :func:`asof_join`.
    """
    lt, rt = on_time
    lkey, rkey = by
    packed = right.groupBy(F.col(rkey).alias(lkey)).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(rt).alias("_rt"), *[F.col(c) for c in value_cols])
            )
        ).alias("_tl")
    )
    joined = left.join(F.broadcast(packed), on=lkey, how="left")
    t = F.col(lt)
    match = F.element_at(F.filter(F.col("_tl"), lambda s: s["_rt"] <= t), -1)
    out = joined.select(
        *left.columns,
        *[match[c].alias(f"asof_{c}") for c in value_cols],
    )
    if how == "inner":
        cond = F.lit(True)
        for c in value_cols:
            cond = cond & F.col(f"asof_{c}").isNotNull()
        out = out.filter(cond)
    return out


ASOF_TOLERANCE_S = 9500 * 86400  # ~26 years: splits the fixture's gap range


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id, o.o_orderdate AS asof_o_orderdate
    FROM events e
    ASOF JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    WHERE date_diff('second', o.o_orderdate, e.ts) <= {ASOF_TOLERANCE_S}
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas merge_asof
    semantics: candidates older than the tolerance never match — equivalent
    to post-filtering the nearest match, since older candidates are
    strictly farther)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(
        ev,
        o,
        on_time=("ts", "o_orderdate"),
        by=("user_id", "o_custkey"),
        value_cols=["o_orderdate"],
        how="inner",
        tolerance_s=ASOF_TOLERANCE_S,
    ).select("event_id", "user_id", "asof_o_orderdate")


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS asof_o_orderdate
    FROM events e
    ASOF JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed as-of join: each event matched to the latest order of the same
    key (user_id = o_custkey) at or before the event time.

    Oracle is DuckDB's native ASOF JOIN; the Spark side uses the union+window
    construction in :func:`asof_join` (reference has no such operator — this
    generalizes the poll-loop's "latest state" pattern to event time).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join(
        ev,
        o,
        on_time=("ts", "o_orderdate"),
        by=("user_id", "o_custkey"),
        value_cols=["o_orderdate"],
        how="inner",
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT o_orderkey, o.o_custkey, c.c_custkey, c_name
    FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
    FULL JOIN (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi-join with unmatched rows surviving on BOTH sides
    (filters guarantee orphans each way; extension inventory — the
    reference has no join surface, /root/reference/batch_processor.go:16-28).

    Scale: full outer cannot broadcast (both sides must see the full key
    space), so Spark plans a shuffle sort-merge join on the equi key —
    one shuffle per side, which is the floor for this semantics. AQE can
    still split skewed partitions at runtime.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_name")
    )
    return o.join(c, o.o_custkey == c.c_custkey, "full_outer").select(
        "o_orderkey", "o_custkey", "c_custkey", "c_name"
    )


@register(
    "join_interval_events",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: each click paired with the same user's
    purchases inside [click_ts, click_ts + 12h] — the batch twin of a
    stream-stream interval join (Structured Streaming's
    ``joinWith .. between`` watermark pattern; extension inventory, the
    reference has no join surface, /root/reference/batch_processor.go:16-28).

    Scale: the equi key (user_id) drives a hash/sort-merge join — ONE
    shuffle per side on user_id, with the time-range predicate evaluated as
    a join residual, never a cartesian expansion. Per-user fanout is bounded
    by activity within the 12 h window, exactly the state bound the
    streaming version enforces via watermarks. The lag is emitted in integer
    microseconds (exact, no float rounding).
    """
    return _interval_events_join(spark, sf_dir, "inner")


def _interval_events_join(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Shared click->purchase interval-join body (ONE source of truth for
    the inner/left_outer pair — r12 self-review reuse find: the window,
    tie semantics, and exact-micros lag must never drift between them)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (c.user_id == p.p_user_id)
            & (p.p_ts >= c.c_ts)
            & (p.p_ts <= c.c_ts + F.expr("INTERVAL 12 HOURS")),
            how,
        )
        .select(
            # coalesce is the identity for inner/left (click side always
            # present); full_outer's orphan purchases take theirs from p
            F.coalesce(c.user_id, p.p_user_id).alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
        )
    )


@register(
    "join_interval_events_outer",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
    """,
)
def join_interval_events_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER event-time interval join — join_interval_events plus
    the ABANDONMENT rows: clicks with no same-user purchase inside
    [click_ts, click_ts + 12 h] survive with NULL purchase columns (the
    cart-abandonment / no-conversion detector, the production complement
    of the conversion join). Batch twin of Structured Streaming's
    watermarked stream-stream leftOuter join, whose null-extended rows
    emit once the watermark passes the click's window upper bound —
    the eviction-time emission tests/test_streaming.py pins on this
    key's unmatched set.

    Scale shape: identical to the inner variant — ONE shuffle per side
    on the user_id equi key, the range predicate as a join residual,
    per-click fanout bounded by the 12 h window. NULL-extension is free
    (the join type, not an extra pass). Body shared with
    join_interval_events via _interval_events_join.
    """
    return _interval_events_join(spark, sf_dir, "left_outer")


@register(
    "join_interval_events_full",
    oracle="""
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
    """,
)
def join_interval_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER event-time interval join — completes the interval
    family: conversions (both sides present), abandonment (click with
    NULL purchase), AND direct purchases (NULL click — no same-user
    click in the preceding 12 h; the organic-traffic detector the left
    variant cannot see). Batch twin of the watermarked stream-stream
    fullOuter join, where each side's null-extension emits once the
    OTHER side's watermark passes the row's match horizon (clicks
    after click_ts + 12 h; purchases after purchase_ts) —
    tests/test_streaming.py pins both release conditions. Body shared
    with the inner/left variants via _interval_events_join — same
    one-shuffle-per-side plan, NULL-extension free on both sides.
    """
    return _interval_events_join(spark, sf_dir, "full_outer")


@register(
    "join_asof_forward",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.ts AS asof_ts
    FROM orders o
    ASOF JOIN events e
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (match-next) as-of join: each order matched to the FIRST
    event of the same key at or after the order date — the "next action
    after X" primitive (attribution, time-to-conversion, SLA tracking).

    Oracle is DuckDB's native forward ASOF (``<=`` comparator); the Spark
    side is :func:`asof_join` with ``direction="forward"``, which negates
    exact epoch-micros and reuses the backward union+window machinery —
    same one-shuffle cost and the same salting escape hatch for hot keys.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return asof_join(
        o,
        ev,
        on_time=("o_orderdate", "ts"),
        by=("o_custkey", "user_id"),
        value_cols=["ts"],
        how="inner",
        direction="forward",
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH b AS (
      SELECT e.event_id, o.o_orderdate AS bd
      FROM events e
      ASOF JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ),
    f AS (
      SELECT e.event_id, o.o_orderdate AS fd
      FROM events e
      ASOF JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE
             WHEN bd IS NULL THEN fd
             WHEN fd IS NULL THEN bd
             WHEN epoch_us(e.ts) - epoch_us(bd)
                  <= epoch_us(fd) - epoch_us(e.ts) THEN bd
             ELSE fd
           END AS nearest_o_orderdate
    FROM events e
    LEFT JOIN b ON e.event_id = b.event_id
    LEFT JOIN f ON e.event_id = f.event_id
    WHERE bd IS NOT NULL OR fd IS NOT NULL
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, nearest-in-either-direction (pandas merge_asof
    ``direction='nearest'``): each event matched to the same-key order
    whose date is CLOSEST to the event time, backward winning exact-gap
    ties (deterministic, matching pandas).

    Composition: one backward carry pass and one forward carry pass (the
    epoch-negation machinery), then a per-row gap comparison — two
    shuffle+window passes total, each the cost of a sort-merge join;
    no per-row range scan. The oracle builds the same two DuckDB ASOF
    sides and applies the identical tie rule.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return asof_join_nearest(
        ev,
        o,
        on_time=("ts", "o_orderdate"),
        by=("user_id", "o_custkey"),
        value_col="o_orderdate",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("nearest_o_orderdate"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on_time: tuple[str, str],
    by: tuple[str, str],
    value_col: str,
) -> DataFrame:
    """Nearest-direction as-of join helper (see join_asof_nearest): one
    backward and one forward carry pass over :func:`asof_join`, then a
    per-row gap comparison on the matched right TIMES with backward
    winning exact ties (pandas merge_asof direction='nearest' tie rule).
    Both time columns must be TimestampType (the forward pass requires
    it); ``value_col`` may be any right column — the right time column is
    carried alongside it for the gap comparison. Inner semantics: left
    rows with no match in either direction are dropped. Output: all left
    columns plus ``nearest_<value_col>``."""
    lt, rt = on_time
    carry = [value_col] if value_col == rt else [value_col, rt]
    back = asof_join(
        left,
        right,
        on_time=on_time,
        by=by,
        value_cols=carry,
        how="left",
    )
    back = back.withColumnRenamed(f"asof_{value_col}", "_bv").withColumnRenamed(
        f"asof_{rt}", "_bt"
    ) if value_col != rt else back.withColumnRenamed(
        f"asof_{value_col}", "_bv"
    ).withColumn("_bt", F.col("_bv"))
    both = asof_join(
        back,
        right,
        on_time=on_time,
        by=by,
        value_cols=carry,
        how="left",
        direction="forward",
    )
    both = both.withColumnRenamed(f"asof_{value_col}", "_fv").withColumnRenamed(
        f"asof_{rt}", "_ft"
    ) if value_col != rt else both.withColumnRenamed(
        f"asof_{value_col}", "_fv"
    ).withColumn("_ft", F.col("_fv"))
    bgap = F.unix_micros(F.col(lt)) - F.unix_micros(F.col("_bt"))
    fgap = F.unix_micros(F.col("_ft")) - F.unix_micros(F.col(lt))
    nearest = (
        F.when(F.col("_bt").isNull(), F.col("_fv"))
        .when(F.col("_ft").isNull(), F.col("_bv"))
        .when(bgap <= fgap, F.col("_bv"))
        .otherwise(F.col("_fv"))
    )
    return (
        both.filter(F.col("_bt").isNotNull() | F.col("_ft").isNotNull())
        .select(*left.columns, nearest.alias(f"nearest_{value_col}"))
    )


@register(
    "join_scd2_lookup",
    oracle="""
    WITH hist AS (
      SELECT user_id,
             value AS attr_value,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS valid_to
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           h.attr_value, h.valid_from
    FROM events p
    JOIN hist h
      ON h.user_id = p.user_id
     AND p.ts >= h.valid_from
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    WHERE p.event_type = 'purchase'
    """,
)
def join_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against an SCD Type-2 history (the
    consumer of cdc_scd2_history's shape): each purchase joined to the
    click-attribute version valid AT its event time — the canonical
    as-was reporting join, on interleaved same-period histories so every
    interval branch (closed intervals AND the open current one) carries
    real matches.

    Scale shape: the equi key (user) drives one shuffle per side and the
    validity interval is a join residual; because versions partition time
    per key, each fact matches at most one version — no fanout. Same
    non-cartesian pattern as join_theta_range, applied to temporal
    dimension lookup (an as-of join computes the same thing; the
    interval-residual form is the one warehouses write).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    hist = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("h_user_id"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return (
        p.join(
            hist,
            (F.col("h_user_id") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("valid_from"))
            & (
                F.col("valid_to").isNull()
                | (F.col("purchase_ts") < F.col("valid_to"))
            ),
        )
        .select("purchase_id", "user_id", "purchase_ts", "attr_value", "valid_from")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit broadcast Bloom filter: revenue
    of lineitems belonging to URGENT orders, with the fact side pre-filtered
    by a blocked Bloom filter BEFORE the exact semi-join shuffle.

    Why this exists at 100 TB: a plain ``LEFT SEMI`` shuffles the ENTIRE
    fact table on the join key even when only a few percent survive. When
    the build side is too large to broadcast raw (100M+ keys) but its
    *Bloom filter* is not, the classic warehouse move (Spark's own runtime
    row-group filters, ORC/Iceberg bloom indexes) is: build a fixed-size
    bit array over the build keys, broadcast it, drop non-matching fact
    rows map-side, and run the exact semi-join only over the survivors —
    shuffle volume scales with the SELECTIVITY, not the fact size.

    Spark's built-in runtime bloom (``spark.sql.optimizer.runtime.
    bloomFilter.enabled``) does this opportunistically; this operator
    makes the plan explicit and engine-portable:

      1. build keys -> blocked Bloom: block = xxhash64(k) mod 8192, two
         bit positions per key from independent xxhash64 seeds; per-block
         ``bit_or`` of the two set bits -> at most 8192 (block, bits64)
         rows == a 64 KB filter regardless of build cardinality;
      2. probe: fact rows compute the same (block, mask) pair, broadcast-
         join the filter on block, keep rows with ``bits & mask == mask``
         (false positives possible, false negatives impossible);
      3. exact ``left_semi`` against the build keys over survivors only.

    The final semi-join makes the result EXACT (the SQL oracle is the
    plain semi-join), so the Bloom stage is pure shuffle-volume savings;
    tests/test_bloom_join.py asserts the candidate set is a superset of
    the true matches and that the filter actually prunes at fixture FPR.
    All three stages are codegen'd JVM expressions — no Python in the path.
    """
    n_blocks = 8192
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("_k"))
        .distinct()
    )

    def with_bloom_cols(df: DataFrame, key: str) -> DataFrame:
        # SQL shiftleft accepts a column shift amount; the PySpark helper
        # only takes a Python int, hence F.expr for the mask.
        return (
            df.withColumn("_blk", F.pmod(F.xxhash64(F.col(key)), F.lit(n_blocks)))
            .withColumn(
                "_b1",
                F.pmod(F.xxhash64(F.col(key), F.lit(1)), F.lit(64)).cast("int"),
            )
            .withColumn(
                "_b2",
                F.pmod(F.xxhash64(F.col(key), F.lit(2)), F.lit(64)).cast("int"),
            )
            .withColumn("_mask", F.expr("shiftleft(1L, _b1) | shiftleft(1L, _b2)"))
            .drop("_b1", "_b2")
        )

    bloom = (
        with_bloom_cols(build, "_k")
        .groupBy("_blk")
        .agg(F.bit_or("_mask").alias("_bits"))
    )

    candidates = (
        with_bloom_cols(li, "l_orderkey")
        .join(F.broadcast(bloom), "_blk", "inner")
        .filter(F.col("_bits").bitwiseAND(F.col("_mask")) == F.col("_mask"))
        .drop("_blk", "_mask", "_bits")
    )
    exact = candidates.join(
        build, candidates.l_orderkey == F.col("_k"), "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "join_fuzzy_trigram",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part WHERE length(p_name) >= 3
    ),
    tri AS (
      SELECT DISTINCT name, substr(name, CAST(i AS INT), 3) AS g
      FROM names, unnest(generate_series(1, length(name) - 2)) AS t(i)
    ),
    sz AS (SELECT name, count(*) AS sz FROM tri GROUP BY name),
    shared AS (
      SELECT a.name AS name_a, b.name AS name_b, count(*) AS shared
      FROM tri a JOIN tri b ON a.g = b.g AND a.name < b.name
      GROUP BY a.name, b.name
    )
    SELECT s.name_a, s.name_b,
           round(CAST(s.shared AS DOUBLE) / (za.sz + zb.sz - s.shared), 6)
             AS jaccard
    FROM shared s
    JOIN sz za ON za.name = s.name_a
    JOIN sz zb ON zb.name = s.name_b
    WHERE CAST(s.shared AS DOUBLE) / (za.sz + zb.sz - s.shared) >= 0.4
    """,
)
def join_fuzzy_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join via character-trigram Jaccard >= 0.4 — the
    set-similarity join (Vernica et al., SIGMOD'10 VJ-join shape):
    inverted index on trigrams as the blocking key, so only pairs
    sharing at least one trigram are ever materialized — never the
    |names|² cross product.

    Plan: one pass builds (name, trigram) distinct postings; the
    candidate join is posting-list self-join on the trigram key (one
    shuffle, co-partitioned by gram), pair-counted, then verified
    against the exact set sizes. At 100 TB the standard refinements
    slot in unchanged: prefix filtering (index only the (1-τ)·|set|+1
    rarest grams per string) cuts candidates ~10x, and a stop-gram cap
    drops ubiquitous grams whose posting lists explode quadratically —
    both noted here, omitted because the verify step already bounds
    work at fixture scale."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .filter(F.length("name") >= 3)
        .distinct()
    )
    tri = names.select(
        "name",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, length(name) - 2),"
                " i -> substr(name, i, 3)))"
            )
        ).alias("g"),
    )
    sz = tri.groupBy("name").agg(F.count(F.lit(1)).alias("sz"))
    a, b = tri.alias("a"), tri.alias("b")
    shared = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")))
        .groupBy(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("za.sz") + F.col("zb.sz") - F.col("shared")
    )
    return (
        shared.join(sz.alias("za"), F.col("name_a") == F.col("za.name"))
        .join(sz.alias("zb"), F.col("name_b") == F.col("zb.name"))
        .filter(jac >= 0.4)
        .select("name_a", "name_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE CAST(event_id % 211 AS BIGINT) END AS k
      FROM events WHERE event_id % 2 = 0
    ),
    r AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN NULL
                  ELSE CAST(event_id % 211 AS BIGINT) END AS k
      FROM events WHERE event_id % 2 = 1
    )
    SELECT count(*) AS n_nullsafe,
           (SELECT count(*) FROM l JOIN r ON l.k = r.k) AS n_plain,
           CAST(count(*) FILTER (WHERE l.k IS NULL) AS BIGINT)
             AS n_null_matches
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of vanishing — the semantics CDC merge and
    SCD-key comparisons need when business keys are nullable (a plain
    equi-join silently drops every NULL-keyed row; the count delta here
    makes the trap measurable). Key cardinality 211 (r9): the original
    5-value key made this demo a ~400M-row join blowup at sf0.1 (17 s
    for a 1-row answer); 211 keeps thousands of matches per scale
    without the quadratic fanout.

    Plan note: Spark hashes <=> keys like ordinary equi-keys (NULLs
    co-locate in one hash bucket), so the null-safe form keeps the same
    shuffle-join shape — BUT all-NULL keys land on one partition: a
    mostly-NULL key column is a skew hazard (salt the NULLs or filter
    + union them separately at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    mk = lambda mod, par: (
        ev.filter(F.col("event_id") % 2 == par).select(
            "event_id",
            F.when(F.col("event_id") % mod == 0, None)
            .otherwise((F.col("event_id") % 211).cast("bigint"))
            .alias("k"),
        )
    )
    l, r = mk(7, 0).alias("l"), mk(11, 1).alias("r")
    ns = l.join(r, F.col("l.k").eqNullSafe(F.col("r.k")))
    plain = l.join(r, F.col("l.k") == F.col("r.k")).agg(
        F.count(F.lit(1)).alias("n_plain")
    )
    return ns.agg(
        F.count(F.lit(1)).alias("n_nullsafe"),
        F.sum(F.when(F.col("l.k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_matches"),
    ).crossJoin(F.broadcast(plain)).select(
        "n_nullsafe", "n_plain", "n_null_matches"
    )


@register(
    "join_fuzzy_trigram_prefix",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part WHERE length(p_name) >= 3
    ),
    tri AS (
      SELECT DISTINCT name, substr(name, CAST(i AS INT), 3) AS g
      FROM names, unnest(generate_series(1, length(name) - 2)) AS t(i)
    ),
    sz AS (SELECT name, count(*) AS sz FROM tri GROUP BY name),
    shared AS (
      SELECT a.name AS name_a, b.name AS name_b, count(*) AS shared
      FROM tri a JOIN tri b ON a.g = b.g AND a.name < b.name
      GROUP BY a.name, b.name
    )
    SELECT s.name_a, s.name_b,
           round(CAST(s.shared AS DOUBLE) / (za.sz + zb.sz - s.shared), 6)
             AS jaccard
    FROM shared s
    JOIN sz za ON za.name = s.name_a
    JOIN sz zb ON zb.name = s.name_b
    WHERE CAST(s.shared AS DOUBLE) / (za.sz + zb.sz - s.shared) >= 0.4
    """,
)
def join_fuzzy_trigram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-FILTERED set-similarity join — identical results to
    join_fuzzy_trigram (same oracle on purpose: the driver verifies the
    optimization preserves semantics), different candidate generation:
    grams are globally ranked rarest-first (ascending document
    frequency), each string indexes only its first
    |s| − ceil(τ·|s|) + 1 grams, and the pigeonhole guarantees any pair
    with Jaccard ≥ τ shares an INDEXED gram (Chaudhuri et al. ICDE'06;
    Vernica SIGMOD'10 PPJoin family). Candidates that survive are
    verified exactly against full gram sets via codegen
    array_intersect.

    This is the 100 TB refinement the base operator's docstring
    promises: posting lists shrink to the rare-gram prefix (the
    frequent grams that explode quadratically are exactly the ones the
    prefix skips), measured ~2-3x candidate reduction at τ=0.4 on the
    fixture (tests/test_fuzzy_prefix.py asserts both the equality and
    the reduction)."""
    tau = 0.4
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .filter(F.length("name") >= 3)
        .distinct()
    )
    tri = names.select(
        "name",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, length(name) - 2),"
                " i -> substr(name, i, 3)))"
            )
        ).alias("g"),
    )
    dfreq = tri.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    ranked = tri.join(F.broadcast(dfreq), "g").withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("name").orderBy("df", "g")),
    )
    szs = tri.groupBy("name").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sort_array(F.collect_set("g")).alias("gs"),
    )
    # Prefix length sz - ceil(tau*sz) + 1 via INTEGER arithmetic: tau as
    # the exact fraction 2/5, ceil(2*sz/5) = (2*sz + 4) div 5. A float
    # F.ceil(0.4 * sz) could round just above an exact integer and
    # silently shorten the prefix by one gram, breaking the lossless
    # pigeonhole guarantee (false negatives) — ADVICE r5.
    tau_num, tau_den = 2, 5
    assert abs(tau_num / tau_den - tau) < 1e-12
    ceil_tau_sz = F.expr(f"({tau_num} * sz + {tau_den - 1}) div {tau_den}")
    index = ranked.join(F.broadcast(szs.select("name", "sz")), "name").filter(
        F.col("rk") <= F.col("sz") - ceil_tau_sz + 1
    )
    a = index.select(F.col("name").alias("name_a"), "g")
    b = index.select(F.col("name").alias("name_b"), "g")
    cand = (
        a.join(b, (a["g"] == b["g"]) & (F.col("name_a") < F.col("name_b")))
        .select("name_a", "name_b")
        .distinct()
    )
    ga = szs.select(
        F.col("name").alias("name_a"), F.col("gs").alias("gs_a"), F.col("sz").alias("sz_a")
    )
    gb = szs.select(
        F.col("name").alias("name_b"), F.col("gs").alias("gs_b"), F.col("sz").alias("sz_b")
    )
    verified = (
        cand.join(F.broadcast(ga), "name_a")
        .join(F.broadcast(gb), "name_b")
        .withColumn("shared", F.size(F.array_intersect("gs_a", "gs_b")))
    )
    jac = F.col("shared").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("shared")
    )
    return verified.filter(jac >= tau).select(
        "name_a", "name_b", F.round(jac, 6).alias("jaccard")
    )


GRID_CELL = 50.0  # grid-file cell width == the search radius
GRID_TOPK = 20  # closest pairs reported


@register(
    "join_spatial_grid",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey AS id,
             (strpos('0123456789abcdef',
                     substr(md5('x:' || CAST(c_custkey AS VARCHAR)), 1, 1)) - 1)
               * 64.0
             + (strpos('0123456789abcdef',
                       substr(md5('x:' || CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)
               * 4.0 AS x,
             (strpos('0123456789abcdef',
                     substr(md5('y:' || CAST(c_custkey AS VARCHAR)), 1, 1)) - 1)
               * 64.0
             + (strpos('0123456789abcdef',
                       substr(md5('y:' || CAST(c_custkey AS VARCHAR)), 2, 1)) - 1)
               * 4.0 AS y
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey AS id,
             (strpos('0123456789abcdef',
                     substr(md5('x:s' || CAST(s_suppkey AS VARCHAR)), 1, 1)) - 1)
               * 64.0
             + (strpos('0123456789abcdef',
                       substr(md5('x:s' || CAST(s_suppkey AS VARCHAR)), 2, 1)) - 1)
               * 4.0 AS x,
             (strpos('0123456789abcdef',
                     substr(md5('y:s' || CAST(s_suppkey AS VARCHAR)), 1, 1)) - 1)
               * 64.0
             + (strpos('0123456789abcdef',
                       substr(md5('y:s' || CAST(s_suppkey AS VARCHAR)), 2, 1)) - 1)
               * 4.0 AS y
      FROM supplier
    ),
    pairs AS (
      SELECT s.id AS supp_id, c.id AS cust_id,
             (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y) AS d2
      FROM supp s
      JOIN cust c
        ON CAST(floor(c.x / {GRID_CELL}) AS BIGINT)
             BETWEEN CAST(floor(s.x / {GRID_CELL}) AS BIGINT) - 1
                 AND CAST(floor(s.x / {GRID_CELL}) AS BIGINT) + 1
       AND CAST(floor(c.y / {GRID_CELL}) AS BIGINT)
             BETWEEN CAST(floor(s.y / {GRID_CELL}) AS BIGINT) - 1
                 AND CAST(floor(s.y / {GRID_CELL}) AS BIGINT) + 1
      WHERE (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)
              <= {GRID_CELL} * {GRID_CELL}
    )
    SELECT supp_id, cust_id, round(sqrt(d2), 6) AS dist
    FROM pairs
    ORDER BY d2 ASC, supp_id ASC, cust_id ASC
    LIMIT {GRID_TOPK}
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-file spatial join (radius search): suppliers and customers
    get deterministic md5-derived planar coordinates in [0,1020)², and
    each supplier finds all customers within {GRID_CELL} units by
    joining its 3×3 NEIGHBORHOOD of grid cells (cell width == radius,
    the classic grid-file guarantee: every within-radius pair shares a
    cell or touches an adjacent one), then exact-distance filtering.
    The {GRID_TOPK} closest pairs come out. This is how a distributed
    engine does proximity joins without a cartesian product — the same
    pattern as the banded trigram join, in 2-D.

    Scale shape: the 9-cell expansion is the join condition itself (a
    range predicate on the cell ids, which Spark executes as a
    broadcast-able range join on the compact supplier side or a
    shuffle on cell id); candidate pairs are bounded by points-per-cell
    density, NEVER |S|×|C|. Planar squared distance only — no trig, so
    both engines share exact arithmetic (a haversine variant needs
    libm sin/cos whose last-ulp behavior is engine-specific). The
    final top-k is a TakeOrderedAndProject, not a global sort.
    """
    hexa = F.lit("0123456789abcdef")

    def coord(prefix: str, key) -> Column:
        h = F.md5(F.concat(F.lit(prefix), key.cast("string")))
        return (
            (F.instr(hexa, F.substring(h, 1, 1)) - 1) * 64.0
            + (F.instr(hexa, F.substring(h, 2, 1)) - 1) * 4.0
        )

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        coord("x:", F.col("c_custkey")).alias("cx"),
        coord("y:", F.col("c_custkey")).alias("cy"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        coord("x:s", F.col("s_suppkey")).alias("sx"),
        coord("y:s", F.col("s_suppkey")).alias("sy"),
    )
    cell = lambda v: F.floor(v / GRID_CELL).cast("bigint")  # noqa: E731
    d2 = (F.col("sx") - F.col("cx")) * (F.col("sx") - F.col("cx")) + (
        F.col("sy") - F.col("cy")
    ) * (F.col("sy") - F.col("cy"))
    pairs = s.join(
        c,
        cell(F.col("cx")).between(cell(F.col("sx")) - 1, cell(F.col("sx")) + 1)
        & cell(F.col("cy")).between(cell(F.col("sy")) - 1, cell(F.col("sy")) + 1),
    ).filter(d2 <= GRID_CELL * GRID_CELL)
    return (
        pairs.select(
            "supp_id", "cust_id", F.round(F.sqrt(d2), 6).alias("dist"), d2.alias("d2")
        )
        .orderBy(F.col("d2").asc(), F.col("supp_id").asc(), F.col("cust_id").asc())
        .limit(GRID_TOPK)
        .drop("d2")
    )
