"""Product-analytics composites over the events stream-shaped table
(extension inventory; the reference pipeline has no query surface,
/root/reference/batch_processor.go:16-28 — these are the event-funnel /
retention questions a warehouse engine is actually asked).

All JVM-side: filters + keyed aggregations + co-partitioned joins on
user_id. Every stage shuffles on the same key, so at 100 TB the funnel
joins reuse one hash partitioning (Catalyst elides the re-exchange when
child output partitioning already matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.dist_rank import distributed_row_number
from go_batch_processor_spark.registry import register


@register(
    "analytics_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.tc
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def analytics_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: users counted at each stage
    only if the stage event happens strictly AFTER their previous stage's
    first event (the order constraint is what makes this a funnel rather
    than three independent counts).

    One-scan form: three CHAINED windows over the same user_id
    partitioning — tv = first view, tc = first click after tv (tv is an
    ordinary column by then), tp = first purchase after tc — so the plan
    is ONE events scan and ONE exchange with three window passes that
    reuse the partitioning. The previous stage-by-stage join cascade
    re-planned the events scan six times (each stage frame was consumed
    twice, and ReuseExchange does not merge them — the q15/q21 finding).
    Distinct-user stage counts come off the windowed frame directly."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("tv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("tc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.agg(
        F.count_distinct(F.when(F.col("tv").isNotNull(), F.col("user_id"))).alias(
            "n_view"
        ),
        F.count_distinct(F.when(F.col("tc").isNotNull(), F.col("user_id"))).alias(
            "n_click_after_view"
        ),
        F.count_distinct(F.when(F.col("tp").isNotNull(), F.col("user_id"))).alias(
            "n_purchase_after_click"
        ),
    )


@register(
    "analytics_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7
                AS BIGINT) AS week_n,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def analytics_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by the week of their first
    event; active_users counts distinct users of each cohort seen again
    week_n weeks later. Both week boundaries are Monday-start truncations
    (Spark and DuckDB agree), and week_n divides an exact multiple of 7.

    One-scan form: the per-user first week is a window over the same
    user_id partitioning instead of an aggregate joined back (which
    re-planned the events scan twice — the ReuseExchange finding); the
    retention rollup then reuses nothing wider than the window's
    exchange."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    week = F.date_trunc("week", F.col("ts"))
    return (
        ev.withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
        .groupBy(
            "cohort_week",
            (F.datediff(week, F.col("cohort_week")) / 7).cast("long").alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "analytics_rolling_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM ud GROUP BY d),
    wau AS (
      SELECT days.d, count(DISTINCT ud.user_id) AS wau
      FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
      GROUP BY days.d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def analytics_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + rolling 7-day WAU per active day.

    A sliding COUNT DISTINCT cannot run as a window aggregate (distinct
    state is not frame-subtractable), so the scalable construction is
    contribution fan-out: each distinct (user, day) pair contributes to the
    7 report days it falls into (posexplode of a 7-element sequence —
    bounded fan-out), then ONE aggregation computes both metrics: WAU as
    the distinct contributors, DAU as the distinct offset-0 contributors
    (offset 0 <=> the user was active on the report day itself). One
    shuffle on the report day, no dau-side re-aggregation and no
    dau x wau join; `dau > 0` filters the trailing report days that fall
    after the user's last active day. Linear in distinct user-days; no
    per-day re-scan of raw events and no quadratic day x day self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    contrib = ud.select(
        F.posexplode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias(
            "off", "rd"
        ),
        "user_id",
    )
    return (
        contrib.groupBy("rd")
        .agg(
            F.countDistinct(F.when(F.col("off") == 0, F.col("user_id"))).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .filter(F.col("dau") > 0)
        .select(
            F.date_format("rd", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
        )
    )


@register(
    "analytics_ab_ttest",
    oracle="""
    WITH g AS (
      SELECT count(*) FILTER (event_type = 'click')                    AS n_a,
             avg(value) FILTER (event_type = 'click')                  AS m_a,
             var_samp(value) FILTER (event_type = 'click')             AS v_a,
             count(*) FILTER (event_type = 'purchase')                 AS n_b,
             avg(value) FILTER (event_type = 'purchase')               AS m_b,
             var_samp(value) FILTER (event_type = 'purchase')          AS v_b
      FROM events
    )
    SELECT n_a, round(m_a, 4) AS mean_a,
           n_b, round(m_b, 4) AS mean_b,
           round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
           round(pow(v_a / n_a + v_b / n_b, 2)
                 / (pow(v_a / n_a, 2) / (n_a - 1)
                    + pow(v_b / n_b, 2) / (n_b - 1)), 2) AS welch_df
    FROM g
    """,
)
def analytics_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between the 'click' and 'purchase' event
    value populations — the A/B-experiment readout, computed as ONE
    conditional-aggregation pass (no split, no join, no second scan).

    Scale: six FILTER-ed aggregates collapse map-side to a single partial
    state per task; the final arithmetic runs on one row. This is the
    always-right shape for experiment analysis over 100 TB of events: a
    full scan, O(1) shuffle bytes.
    """
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == "click"
    b = F.col("event_type") == "purchase"
    g = ev.agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.avg(F.when(b, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(b, F.col("value"))).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    df_num = F.pow(se2, 2)
    df_den = (
        F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return g.select(
        "n_a",
        F.round("m_a", 4).alias("mean_a"),
        "n_b",
        F.round("m_b", 4).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(df_num / df_den, 2).alias("welch_df"),
    )


@register(
    "analytics_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, sum(cnt) AS total FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.cnt,
           round(p.cnt * 1.0 / t.total, 4) AS p_transition
    FROM pairs p JOIN tot t ON p.from_type = t.from_type
    """,
)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current event type), the standard building block
    for session modeling and next-action prediction.

    Scale plan: one window shuffle on user_id builds the (from, to) pairs
    (inherent — sequence order lives per user), then the pair counts are a
    partial-combinable aggregation whose output is at most |types|^2 rows.
    The row normalization is a from_type window ON THAT AGG OUTPUT —
    reusing the pairs frame through a second aggregate would re-plan the
    whole events scan + user window (ReuseExchange does not bridge it,
    same finding as tpch_q15_shape), so the window keeps it at one scan
    and three exchanges, the last over |types|^2 rows. Ordering ties
    broken by event_id on both engines (events ts is unique only at
    nanos, and both sides compare at micros — HANDOFF.md fact 1)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return pairs.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(
            F.col("cnt") / F.sum("cnt").over(Window.partitionBy("from_type")), 4
        ).alias("p_transition"),
    )


@register(
    "analytics_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value)         AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3.0
    """,
)
def analytics_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flagging: events more than 3 sigma from
    their type's mean — the standard first-pass outlier screen on a
    metrics stream.

    Scale shape: the stats aggregate reduces the corpus to |types| rows
    (one partial-combinable shuffle), broadcasts back onto the stream,
    and the flag itself is a narrow filter — so a 100 TB scan pays one
    tiny agg plus one map-side join, and predicate pushdown still prunes
    the rescan columns. Welford-style single-pass moments are what
    avg/stddev_samp already compute internally."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("sigma") > 0) & (F.abs(z) > 3.0))
        .select("event_id", "event_type", F.round(z, 4).alias("zscore"))
    )


@register(
    "analytics_attribution_last_touch",
    oracle="""
    WITH touches AS (
      SELECT user_id, ts, min(event_type) AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT t.touch_type,
           CAST(count(*) AS BIGINT) AS conversions,
           round(avg(date_diff('microsecond', t.ts, p.ts) / 1000000.0), 4)
             AS avg_latency_s
    FROM purchases p
    ASOF JOIN touches t ON p.user_id = t.user_id AND p.ts >= t.ts
    GROUP BY t.touch_type
    """,
)
def analytics_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credited to the
    user's most recent view/click at-or-before it, with per-touch-type
    conversion counts and mean touch-to-purchase latency — the as-of
    machinery applied to its canonical product-analytics use.

    Determinism: touches are first deduped to one row per (user, micro
    ts) with min(event_type) priority ON BOTH SIDES, so the as-of match
    can never tie between two touch rows at the same instant (events ts
    is unique only at nanos and both engines compare at micros —
    HANDOFF fact 1). Latency sums are exact micro longs before the one
    final division. Cost: the :func:`joins.asof_join` single shuffle on
    user_id plus agg-output-sized rollups."""
    from go_batch_processor_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", F.col("ts").alias("t_ts"))
        .agg(F.min("event_type").alias("touch_type"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    matched = asof_join(
        purchases,
        touches.select(F.col("user_id").alias("t_user"), "t_ts", "touch_type"),
        on_time=("ts", "t_ts"),
        by=("user_id", "t_user"),
        value_cols=["touch_type", "t_ts"],
        how="inner",
    )
    latency = (F.unix_micros("ts") - F.unix_micros("asof_t_ts")) / F.lit(1_000_000.0)
    return (
        matched.groupBy(F.col("asof_touch_type").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.round(F.avg(latency), 4).alias("avg_latency_s"),
        )
    )


RFM_ASOF = "2024-02-01"  # fixed analysis date (events span Jan 2024)


@register(
    "analytics_rfm_segmentation",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
             date_diff('day', max(ts), TIMESTAMP '{RFM_ASOF}') AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(value), 2) AS monetary
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, user_id ASC)  AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, user_id ASC)   AS m_quartile
    FROM base
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the classic marketing-analytics scoring, with
    deterministic user_id tiebreaks in every ntile ordering (without
    them quartile boundaries flap between engines).

    Scale note: global ntile over |users| rows is unbounded at 100 TB,
    so each quartile is computed as ntile's EXACT closed form over the
    two-pass distributed global rank (literal quantile buckets +
    per-bucket parallel row_number + literal offsets; dist_rank.py —
    the round-5 straggler fix): with n known exactly driver-side,
    ntile(4) of rank rn is pure integer arithmetic (first n%4 buckets
    get ⌈n/4⌉ rows, the rest ⌊n/4⌋). The three rank passes chain on one
    frame — the executed plan is scan → per-user agg → three per-bucket
    window sorts (each parallel across ~64 balanced buckets) → project.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("timestamp"), F.max("ts")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
        # each distributed_row_number consumes its input three times and
        # the three calls CHAIN — without truncation r3's sample pass
        # re-executes the events scan + agg ~9x; checkpoint the
        # node-sized frame at each link (the lift_gain/_spread lesson)
    ).localCheckpoint(eager=False)
    r1, n = distributed_row_number(
        base, "recency_days",
        [F.col("recency_days").asc(), F.col("user_id").asc()], "__rn_r",
    )
    r2, _ = distributed_row_number(
        r1.localCheckpoint(eager=False), "frequency",
        [F.col("frequency").desc(), F.col("user_id").asc()], "__rn_f",
        descending=True,
    )
    r3, _ = distributed_row_number(
        r2.localCheckpoint(eager=False), "monetary",
        [F.col("monetary").desc(), F.col("user_id").asc()], "__rn_m",
        descending=True,
    )

    def ntile4(rn):
        # ntile(4) closed form: with q, r = divmod(n, 4), the first r
        # buckets hold q+1 rows; integer-exact (divisions of ints are
        # never within 1e-11 of a wrong integer boundary at this scale).
        q, r = divmod(n, 4)
        if q == 0:
            return rn.cast("int")
        head = r * (q + 1)
        b1 = ((rn + q) / (q + 1)).cast("long")  # ceil(rn / (q+1))
        b2 = F.lit(r) + ((rn - head + q - 1) / q).cast("long")
        return F.when(rn <= F.lit(head), b1).otherwise(b2).cast("int")

    return r3.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        ntile4(F.col("__rn_r")).alias("r_quartile"),
        ntile4(F.col("__rn_f")).alias("f_quartile"),
        ntile4(F.col("__rn_m")).alias("m_quartile"),
    )


@register(
    "analytics_robust_zscore_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           floor(0.6745 * (d.value - d.med) / m.mad * 10000.0 + 0.5)
             / 10000.0 AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0
      AND abs(0.6745 * (d.value - d.med) / m.mad) > 3.5
    """,
)
def analytics_robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen (Iglewicz-Hoaglin modified
    z-score, 0.6745·(x−med)/MAD > 3.5) — the mean/stddev screen's
    robust twin: a single wild value inflates sigma and MASKS other
    outliers; the median/MAD pair has a 50% breakdown point.

    Plan: two tiny aggregates (per-type median, then per-type median of
    absolute deviations) each broadcast back onto the stream — the
    corpus is scanned, never shuffled. Exact percentile sorts per
    group; at 100 TB swap in approx_percentile for both quantiles (the
    screen tolerates sketch error, the 3.5 cut is a heuristic anyway).

    Grain: the output grain is the SCALED-FLOOR round
    floor(z*1e4 + 0.5)/1e4 on BOTH engines, not round(z, 4). The r13
    x10 parity sweep caught the distinction: z = 3.85225 is exact in
    DECIMAL arithmetic (4-decimal constant x 2-decimal data / 2-decimal
    MAD), so its double sits one ulp BELOW the half-boundary — and the
    engines then disagree on rounding that identical double (Spark
    BigDecimal-exact HALF_UP says 3.8522, DuckDB's scaled-multiply
    nearbyint says 3.8523; 3 such landings exist at sf0.1 already).
    floor/multiply are IEEE-exact primitives, so the shared scaled-floor
    expression is bit-identical cross-engine at every scale
    (determinism-ledger class 10's in-engine analogue of the
    driver-side _round6_floor convention).
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    rz_grain = (
        F.floor(rz * F.lit(10000.0) + F.lit(0.5)).cast("double") / F.lit(10000.0)
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > 3.5))
        .select("event_id", "event_type", rz_grain.alias("robust_z"))
    )


@register(
    "analytics_window_funnel",
    oracle="""
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS tv
      FROM events
    ),
    w2 AS (
      SELECT *,
             min(CASE WHEN event_type = 'click' AND ts > tv
                       AND ts <= tv + INTERVAL 24 HOUR THEN ts END)
               OVER (PARTITION BY user_id) AS tc
      FROM w1
    ),
    w3 AS (
      SELECT *,
             min(CASE WHEN event_type = 'purchase' AND ts > tc
                       AND ts <= tv + INTERVAL 24 HOUR THEN ts END)
               OVER (PARTITION BY user_id) AS tp
      FROM w2
    ),
    u AS (
      SELECT user_id, any_value(tv) AS tv, any_value(tc) AS tc,
             any_value(tp) AS tp
      FROM w3 GROUP BY user_id
    )
    SELECT CASE WHEN tp IS NOT NULL THEN 3
                WHEN tc IS NOT NULL THEN 2
                ELSE 1 END             AS funnel_level,
           CAST(count(*) AS BIGINT)   AS n_users
    FROM u WHERE tv IS NOT NULL
    GROUP BY 1
    """,
)
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (ClickHouse windowFunnel shape):
    view -> click -> purchase where the whole chain must complete
    within 24 h of the user's FIRST view, each step strictly after the
    previous; emits the histogram of deepest level reached.

    Greedy earliest-anchor semantics: the window anchors at the first
    view (ClickHouse's sliding variant retries later anchors; the
    greedy form is deterministic and oracle-expressible — a user who
    views on day 1 with no follow-up and converts fully on day 10
    counts level 1 here, level 3 there; documented divergence).

    Plan: like analytics_funnel_conversion, ONE events scan and ONE
    user_id exchange carrying three chained window passes (each step's
    anchor is an ordinary column by the next pass) — no join cascade,
    no rescan; the final histogram is a |levels|-row aggregate. This
    is the shape that survives 100 TB: per-user state never leaves its
    partition."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    day = F.expr("tv + INTERVAL 24 HOURS")
    w1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("tv"),
    )
    w2 = w1.withColumn(
        "tc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("tv"))
                & (F.col("ts") <= day),
                F.col("ts"),
            )
        ).over(w),
    )
    w3 = w2.withColumn(
        "tp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("tc"))
                & (F.col("ts") <= day),
                F.col("ts"),
            )
        ).over(w),
    )
    u = w3.groupBy("user_id").agg(
        F.first("tv").alias("tv"), F.first("tc").alias("tc"), F.first("tp").alias("tp")
    )
    return (
        u.filter(F.col("tv").isNotNull())
        .groupBy(
            F.when(F.col("tp").isNotNull(), 3)
            .when(F.col("tc").isNotNull(), 2)
            .otherwise(1)
            .alias("funnel_level")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "analytics_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(count(*) AS BIGINT)            AS n
    FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def analytics_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step behavioral paths (consecutive
    event-type trigrams per user, ordered by ts with event_id
    tie-break) — the Sankey/path-analysis primitive.

    Plan: one user_id window (two leads share the single sort), a
    path-count aggregate, then TakeOrderedAndProject for the top-k —
    no global sort materializes. Deterministic: tie-broken by path so
    the k-boundary can't flip between engines. At 100 TB the window
    partitions by user (bounded per-user state) and the count shuffle
    carries only |distinct paths| ≤ |types|³ keys."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@register(
    "analytics_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    )
    SELECT d.d AS day,
           CAST(sum(CASE WHEN d.d = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(sum(CASE WHEN d.d > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM daily d JOIN firsts f USING (user_id)
    GROUP BY d.d
    """,
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user counts as `new` on
    their first-ever active day and `returning` on every later active
    day — the acquisition/retention headline metric.

    One-scan form: first_day is a user-partition window over the SAME
    distinct (user, day) frame that feeds the daily rollup, so the plan
    is one scan, one user_id exchange, one day aggregate — no
    firsts-table join (the join formulation in the oracle would rescan;
    windows over agg output are the engine's lesson-9 idiom)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    first_day = F.min("d").over(Window.partitionBy("user_id"))
    return (
        daily.withColumn("first_day", first_day)
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.sum(F.when(F.col("d") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("d") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


@register(
    "analytics_stickiness_dau_mau",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM daily GROUP BY d),
    mau AS (
      SELECT a.d, count(DISTINCT b.user_id) AS mau
      FROM (SELECT DISTINCT d FROM daily) a
      JOIN daily b ON b.d > a.d - INTERVAL 28 DAY AND b.d <= a.d
      GROUP BY a.d
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           round(dau.dau * 1.0 / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def analytics_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness (DAU / trailing-28-day MAU) per day — the engagement
    ratio product teams live by.

    The MAU side needs COUNT DISTINCT over a sliding 28-day window,
    which a window frame cannot do (distinct isn't decomposable over
    frames) — the scalable form is the day×active-day band join over
    the DISTINCT (day, user) frame: |days| × 28 × daily-actives rows,
    bounded by calendar length, never raw volume. At larger spans the
    sketch path (per-day HLL pages OR-merged over the trailing window,
    agg_hll_partitioned_merge) replaces the exact distinct; this exact
    form is what the oracle checks."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    dau = daily.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    days = daily.select("d").distinct().select(F.col("d").alias("day"))
    mau = (
        days.join(
            daily,
            (F.col("d") > F.col("day") - F.expr("INTERVAL 28 DAYS"))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, dau["d"] == mau["day"])
        .select(
            F.col("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.round(F.col("dau") * 1.0 / F.col("mau"), 6).alias("stickiness"),
        )
    )


@register(
    "analytics_gini_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, sum(value) AS x FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x, user_id) AS i,
             count(*)     OVER ()                    AS n,
             sum(x)       OVER ()                    AS sx
      FROM per_user
    )
    SELECT round(2.0 * sum(i * x) / (any_value(n) * any_value(sx))
                 - (any_value(n) + 1.0) / any_value(n), 6) AS gini,
           CAST(any_value(n) AS BIGINT) AS n_users
    FROM ranked
    """,
)
def analytics_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user value concentration (the
    whale-dependence metric): G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over
    ascending-sorted user totals.

    Plan: corpus -> per-user totals (one partial-combinable shuffle),
    then EXACT global ranks via the two-pass distributed ranking helper
    (ties broken by user_id; Σ i·x is tie-order-invariant anyway since
    equal x contribute x·Σi regardless of order within the tie): literal
    quantile-bucket boundaries, per-bucket parallel row_number, literal
    cumulative offsets — NO single-task global window over the |users|
    frame (the round-5 straggler finding). A single-row aggregate closes
    it."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum("value").alias("x")
        # consumed 3x by the rank helper; truncate the scan+agg lineage
    ).localCheckpoint(eager=False)
    ranked, _n = distributed_row_number(
        per_user, "x", [F.col("x").asc(), F.col("user_id").asc()], "i"
    )
    n = F.count(F.lit(1))
    return ranked.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
        n.cast("bigint").alias("n_users"),
    )


@register(
    "analytics_basket_affinity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_type
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    sup AS (SELECT p_type, count(*) AS c FROM items GROUP BY 1),
    pairs AS (
      SELECT a.p_type AS t1, b.p_type AS t2, count(*) AS c12
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, CAST(c12 AS BIGINT) AS c12,
           round(c12 * 1.0 / n_orders, 6)              AS support,
           round(c12 * 1.0 / s1.c, 6)                  AS confidence,
           round((c12 * 1.0 * n_orders) / (s1.c * s2.c), 6) AS lift
    FROM pairs
    JOIN sup s1 ON s1.p_type = pairs.t1
    JOIN sup s2 ON s2.p_type = pairs.t2
    CROSS JOIN n
    ORDER BY lift DESC, t1, t2
    LIMIT 15
    """,
)
def analytics_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased part types:
    support, confidence, and lift per type pair, top-15 by lift — the
    Apriori 2-itemset core.

    Plan: basket items = lineitem⋈part (dimension broadcast), the pair
    stage self-joins WITHIN orderkey (co-located after one shuffle on
    the basket key; fanout is C(basket_size, 2), bounded by basket
    width — never corpus-quadratic), supports re-aggregate the same
    item frame, and the rule metrics are integer-count arithmetic in an
    identical tree → bit-exact ordering at the k-boundary. At 100 TB
    with unbounded vocabulary, pairs above a min-support threshold
    first (classic Apriori prune) — the fixture's 6-type vocabulary
    needs no prune."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(pa), li["l_partkey"] == pa["p_partkey"])
        .select("l_orderkey", "p_type")
        .distinct()
    )
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    sup = items.groupBy("p_type").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(F.col("a.p_type").alias("t1"), F.col("b.p_type").alias("t2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    lift = (F.col("c12") * 1.0 * F.col("n_orders")) / (F.col("s1.c") * F.col("s2.c"))
    return (
        pairs.join(F.broadcast(sup.alias("s1")), F.col("t1") == F.col("s1.p_type"))
        .join(F.broadcast(sup.alias("s2")), F.col("t2") == F.col("s2.p_type"))
        .crossJoin(F.broadcast(n))
        .orderBy(lift.desc(), "t1", "t2")
        .limit(15)
        .select(
            "t1",
            "t2",
            F.col("c12").cast("bigint").alias("c12"),
            F.round(F.col("c12") * 1.0 / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("c12") * 1.0 / F.col("s1.c"), 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


@register(
    "analytics_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, f.cohort_day,
             CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts))
                  AS BIGINT) // 7 AS week_offset,
             e.value AS v
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    wk AS (
      SELECT date_trunc('week', cohort_day) AS cohort_week,
             week_offset,
             sum(v) AS wk_rev
      FROM rev GROUP BY 1, 2
    ),
    sizes AS (
      SELECT date_trunc('week', cohort_day) AS cohort_week,
             CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY 1
    )
    SELECT w.cohort_week, CAST(w.week_offset AS BIGINT) AS week_offset,
           s.cohort_users,
           round(sum(w.wk_rev) OVER (PARTITION BY w.cohort_week
                   ORDER BY w.week_offset) / s.cohort_users, 4)
             AS cum_ltv_per_user
    FROM wk w JOIN sizes s USING (cohort_week)
    """,
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per user by signup
    cohort (week) and weeks-since-signup — the money twin of the
    retention triangle (analytics_retention_cohort counts heads; this
    tracks value), the payback-period table growth teams steer by.

    Plan: first-seen day via one user aggregate, revenue keyed to
    (cohort, offset) in one partial-combinable aggregate (calendar² -
    bounded output), cohort sizes re-aggregate the firsts frame, and
    the cumulative sum is an ordered window over the tiny cohort grid —
    running sums over full orderings are bit-deterministic, so only the
    final per-user division is rounded."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            F.date_trunc("week", "cohort_day").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).cast(
                    "bigint"
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            F.col("value").alias("v"),
        )
    )
    wk = rev.groupBy("cohort_week", "week_offset").agg(F.sum("v").alias("wk_rev"))
    sizes = firsts.groupBy(
        F.date_trunc("week", "cohort_day").alias("cohort_week")
    ).agg(F.count(F.lit(1)).alias("cohort_users"))
    w_run = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        wk.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            F.col("week_offset"),
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.round(
                F.sum("wk_rev").over(w_run) / F.col("cohort_users"), 4
            ).alias("cum_ltv_per_user"),
        )
    )


@register(
    "analytics_pareto_share",
    oracle="""
    WITH per_user AS (
      SELECT user_id, sum(value) AS x FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x DESC, user_id) AS rk,
             count(*)     OVER ()                         AS n,
             sum(x)       OVER ()                         AS sx
      FROM per_user
    )
    SELECT round(sum(CASE WHEN rk * 10 <= n THEN x ELSE 0 END)
                 / any_value(sx), 6)  AS top10pct_share,
           round(sum(CASE WHEN rk * 5 <= n THEN x ELSE 0 END)
                 / any_value(sx), 6)  AS top20pct_share,
           CAST(any_value(n) AS BIGINT) AS n_users
    FROM ranked
    """,
)
def analytics_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the share of total value contributed by the
    top 10% / 20% of users (the '80/20' number execs actually quote;
    analytics_gini_concentration is its integral form).

    Same plan skeleton as Gini: per-user totals, then EXACT descending
    global ranks via the two-pass distributed helper (literal quantile
    buckets + per-bucket parallel row_number + literal offsets — no
    single-task window; round-5 straggler fix), and a 1-row aggregate.
    The helper also returns the exact total n as a driver-side literal,
    so the rank-cutoff comparisons (rk·10 ≤ n) stay pure integer
    arithmetic — no floating boundary to diverge; only the final shares
    are rounded."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum("value").alias("x")
        # consumed 3x by the rank helper; truncate the scan+agg lineage
    ).localCheckpoint(eager=False)
    ranked, n = distributed_row_number(
        per_user,
        "x",
        [F.col("x").desc(), F.col("user_id").asc()],
        "rk",
        descending=True,
    )
    return ranked.agg(
        F.round(
            F.sum(F.when(F.col("rk") * 10 <= F.lit(n), F.col("x")).otherwise(0.0))
            / F.sum("x"),
            6,
        ).alias("top10pct_share"),
        F.round(
            F.sum(F.when(F.col("rk") * 5 <= F.lit(n), F.col("x")).otherwise(0.0))
            / F.sum("x"),
            6,
        ).alias("top20pct_share"),
        F.lit(n).cast("bigint").alias("n_users"),
    )


@register(
    "analytics_conversion_latency",
    oracle="""
    WITH touches AS (
      SELECT user_id, ts, min(event_type) AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    lat AS (
      SELECT date_diff('microsecond', t.ts, p.ts) / 1000000.0 AS lat_s
      FROM purchases p
      ASOF JOIN touches t ON p.user_id = t.user_id AND p.ts >= t.ts
    )
    SELECT CAST(count(*) AS BIGINT)            AS n_conversions,
           round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
           round(quantile_cont(lat_s, 0.9), 4) AS p90_s,
           round(quantile_cont(lat_s, 0.99), 4) AS p99_s
    FROM lat
    """,
)
def analytics_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: p50/p90/p99 of the gap between a
    purchase and the user's most recent preceding touch (view/click) —
    the percentile companion to analytics_attribution_last_touch's
    average (latency is heavy-tailed; the median and the p99 tell
    different stories and the mean tells neither).

    Plan: the backward as-of join IS the engine's one-shuffle
    union+window machinery (joins.asof_join), then one exact-percentile
    aggregate over the |purchases|-row latency frame. Same 100 TB note
    as every exact percentile here: approx_percentile slots in
    unchanged."""
    from go_batch_processor_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.min("event_type").alias("touch_type"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    joined = asof_join(
        purchases,
        touches.select("user_id", F.col("ts").alias("t_ts"), "touch_type"),
        on_time=("p_ts", "t_ts"),
        by=("user_id", "user_id"),
        value_cols=["t_ts"],
    )
    lat = joined.filter(F.col("asof_t_ts").isNotNull()).select(
        (
            (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("asof_t_ts")))
            / 1000000.0
        ).alias("lat_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 4).alias("p90_s"),
        F.round(F.expr("percentile(lat_s, 0.99)"), 4).alias("p99_s"),
    )


@register(
    "analytics_peak_concurrency",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id,
             min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM (
        SELECT user_id, ts,
               sum(is_start) OVER (PARTITION BY user_id
                 ORDER BY ts) AS sid
        FROM marked
      )
      GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s_start AS t, 1 AS d FROM sess
      UNION ALL
      SELECT s_end AS t, -1 AS d FROM sess
    ),
    sweep AS (
      SELECT t,
             sum(d) OVER (ORDER BY t, d DESC) AS concurrent
      FROM deltas
    )
    SELECT CAST(max(concurrent) AS BIGINT) AS peak_concurrent,
           (SELECT min(t) FROM sweep s2
            WHERE s2.concurrent = (SELECT max(concurrent) FROM sweep))
             AS peak_time,
           (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions
    FROM sweep
    """,
)
def analytics_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions (30-min-inactivity sessionization, then
    the +1/−1 sweep line): the capacity-planning number — how many
    users were live AT ONCE, and when.

    Plan: sessionization is the gaps-and-islands pass (one user window);
    the sweep is a union of +1 start / −1 end deltas with ONE global
    ordered running sum (end-before-start tie order d DESC so a session
    ending exactly when another starts counts both — the standard
    closed-open convention made explicit). At 100 TB the global sweep
    sorts 2·|sessions| tiny rows — sessions, not events; for
    multi-tenant sharding, sweep per tenant partition and take the max
    of maxes. Running sums over full orderings are bit-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_u).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_u))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = (
        marked.withColumn(
            "sid",
            F.sum("is_start").over(
                Window.partitionBy("user_id")
                .orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("s_end"),
        )
    )
    deltas = sess.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    sweep = deltas.select(
        "t",
        F.sum("d")
        .over(
            Window.partitionBy()
            .orderBy(F.col("t"), F.col("d").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("concurrent"),
    )
    peak = sweep.agg(F.max("concurrent").alias("pk"))
    peak_time = (
        sweep.join(F.broadcast(peak), sweep["concurrent"] == peak["pk"])
        .agg(F.min("t").alias("peak_time"))
    )
    n_sess = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        peak.crossJoin(F.broadcast(peak_time))
        .crossJoin(F.broadcast(n_sess))
        .select(
            F.col("pk").cast("bigint").alias("peak_concurrent"),
            "peak_time",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
        )
    )


@register(
    "analytics_diff_in_diff",
    oracle="""
    WITH marked AS (
      SELECT o_totalprice AS y,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS post
      FROM orders
    ),
    cells AS (
      SELECT treated, post,
             CAST(count(*) AS BIGINT) AS n,
             sum(y)     AS s,
             sum(y * y) AS q
      FROM marked GROUP BY treated, post
    ),
    stats AS (
      SELECT treated, post, n,
             s / n AS mean,
             (q - s * s / n) / (n - 1) / n AS mean_var
      FROM cells
    ),
    wide AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 1 THEN mean END) AS m_t1,
        max(CASE WHEN treated = 1 AND post = 0 THEN mean END) AS m_t0,
        max(CASE WHEN treated = 0 AND post = 1 THEN mean END) AS m_c1,
        max(CASE WHEN treated = 0 AND post = 0 THEN mean END) AS m_c0,
        sum(mean_var)                                         AS var_did,
        CAST(sum(n) AS BIGINT)                                AS n_total
      FROM stats
    )
    SELECT n_total,
           round(m_t1 - m_t0, 6)                       AS delta_treated,
           round(m_c1 - m_c0, 6)                       AS delta_control,
           round((m_t1 - m_t0) - (m_c1 - m_c0), 6)     AS did,
           round(sqrt(var_did), 6)                     AS se,
           round(((m_t1 - m_t0) - (m_c1 - m_c0))
                 / sqrt(var_did), 6)                   AS z
    FROM wide
    """,
)
def analytics_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator: did the high-priority
    segment's mean order value move differently across the 1998-01-01
    boundary than the low-priority segment's? DID = (ȳ_T,post −
    ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with the Welch-style standard
    error √Σ s²_cell/n_cell over the four cells — the work-horse causal
    estimator when a rollout hits one segment and the other serves as
    the parallel-trends control. (On this fixture the expected answer
    is ≈ 0 — priorities are assigned independently of date — making it
    a true negative control.)

    Scale shape: ONE partial-combinable conditional aggregate produces
    the four cells' sufficient statistics (n, Σy, Σy²); the 2×2 pivot,
    the estimator, and its z are closed-form arithmetic over FOUR rows.
    Nothing data-sized survives the single shuffle.
    """
    od = load_table(spark, sf_dir, "orders")
    marked = od.select(
        F.col("o_totalprice").alias("y"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
        ).otherwise(0).alias("post"),
    )
    cells = marked.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    stats = cells.select(
        "treated",
        "post",
        "n",
        (s / n).alias("mean"),
        ((q - s * s / n) / (n - 1) / n).alias("mean_var"),
    )

    def cell_mean(t: int, p: int):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean"))
        )

    wide = stats.agg(
        cell_mean(1, 1).alias("m_t1"),
        cell_mean(1, 0).alias("m_t0"),
        cell_mean(0, 1).alias("m_c1"),
        cell_mean(0, 0).alias("m_c0"),
        F.sum("mean_var").alias("var_did"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    dt = F.col("m_t1") - F.col("m_t0")
    dc = F.col("m_c1") - F.col("m_c0")
    return wide.select(
        "n_total",
        F.round(dt, 6).alias("delta_treated"),
        F.round(dc, 6).alias("delta_control"),
        F.round(dt - dc, 6).alias("did"),
        F.round(F.sqrt(F.col("var_did")), 6).alias("se"),
        F.round((dt - dc) / F.sqrt(F.col("var_did")), 6).alias("z"),
    )


@register(
    "analytics_attribution_linear",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS seg
      FROM events
    ),
    touches AS (
      SELECT user_id, seg, event_type AS touch_type,
             CAST(count(*) AS BIGINT) AS n_t
      FROM seq WHERE event_type IN ('view', 'click')
      GROUP BY 1, 2, 3
    ),
    ttot AS (
      SELECT user_id, seg, CAST(sum(n_t) AS BIGINT) AS n_tot
      FROM touches GROUP BY 1, 2
    ),
    purch AS (
      SELECT user_id, seg, value FROM seq WHERE event_type = 'purchase'
    ),
    credited AS (
      SELECT t.touch_type,
             p.value * t.n_t / tt.n_tot AS credit,
             p.user_id, p.seg
      FROM purch p
      JOIN ttot tt ON p.user_id = tt.user_id AND p.seg = tt.seg
      JOIN touches t ON p.user_id = t.user_id AND p.seg = t.seg
    ),
    direct AS (
      SELECT 'direct' AS touch_type, p.value AS credit, p.user_id, p.seg
      FROM purch p
      LEFT JOIN ttot tt ON p.user_id = tt.user_id AND p.seg = tt.seg
      WHERE tt.n_tot IS NULL
    )
    SELECT touch_type,
           round(sum(credit), 4)                      AS total_credit,
           CAST(count(*) AS BIGINT)                   AS n_credit_rows
    FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
    GROUP BY touch_type
    ORDER BY touch_type
    """,
)
def analytics_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: each purchase's
    value splits evenly across ALL of the user's view/click touches
    since their previous purchase; purchases with no preceding touch in
    their segment credit a 'direct' bucket. The fairness-spectrum
    counterpart to analytics_attribution_last_touch (which gives the
    final touch everything) — run both and the gap between them bounds
    every position-weighted scheme in between.

    Scale shape: segment ids come from ONE exclusive running sum per
    user (the purchase counter — hash-partitioned by user, parallel);
    everything after operates on per-(user, segment) AGGREGATES: touch
    type counts, segment totals, and two co-partitioned joins keyed on
    (user, seg). Credit arithmetic value·n_t/n_tot is exact integer
    ratios times the 2-decimal value; sums rounded once at the edge.
    Tie order inside a user is (ts, event_id) — the repo-wide
    deterministic sequence rule.
    """
    ev = load_table(spark, sf_dir, "events")
    w_seg = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "value",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_seg),
            F.lit(0),
        ).alias("seg"),
    )
    touches = (
        seq.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "seg", F.col("event_type").alias("touch_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    )
    ttot = touches.groupBy("user_id", "seg").agg(
        F.sum("n_t").cast("bigint").alias("n_tot")
    )
    purch = seq.filter(F.col("event_type") == "purchase").select(
        "user_id", "seg", "value"
    )
    credited = (
        purch.join(ttot, ["user_id", "seg"])
        .join(touches, ["user_id", "seg"])
        .select(
            "touch_type",
            (F.col("value") * F.col("n_t") / F.col("n_tot")).alias("credit"),
        )
    )
    direct = (
        purch.join(ttot, ["user_id", "seg"], "left_outer")
        .filter(F.col("n_tot").isNull())
        .select(F.lit("direct").alias("touch_type"), F.col("value").alias("credit"))
    )
    return (
        credited.unionByName(direct)
        .groupBy("touch_type")
        .agg(
            F.round(F.sum("credit"), 4).alias("total_credit"),
            F.count(F.lit(1)).cast("bigint").alias("n_credit_rows"),
        )
        .orderBy("touch_type")
    )


@register(
    "analytics_audience_overlap",
    oracle="""
    WITH membership AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM membership GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM membership a
      JOIN membership b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
           round(i.n_both * 1.0 / (sa.n + sb.n - i.n_both), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
    ORDER BY type_a, type_b
    """,
)
def analytics_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the user sets
    behind every pair of event types — the segmentation question
    ("are clickers and purchasers the same people?") that drives
    budget-allocation and dedup decisions across channels. Exact (the
    type cardinality is small); agg_kmv_theta_intersect is the sketch
    path when the segment key is unbounded.

    Scale shape: one distinct (user, type) reduction; the pair
    intersections come from a SELF-JOIN keyed on user_id —
    co-partitioned, with per-user fan-out bounded by |types|² (≤25
    rows per user here), so the join output is linear in users, never
    |users|². Segment sizes broadcast back onto the ≤C(|types|,2)-row
    result. Integer counts — exact at any partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    membership = ev.select("user_id", "event_type").distinct()
    sizes = membership.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = membership.alias("a")
    b = membership.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "analytics_repeat_purchase_rate",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_purch,
             min(ts) AS first_p,
             min(CASE WHEN rn = 2 THEN ts END) AS second_p
      FROM (
        SELECT user_id, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      )
      GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buyers,
           CAST(sum(CASE WHEN n_purch >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           round(sum(CASE WHEN n_purch >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS repeat_rate,
           round(quantile_cont(
                   CASE WHEN second_p IS NOT NULL
                        THEN date_diff('second', first_p, second_p) / 3600.0
                   END, 0.5), 6) AS median_hours_to_second
    FROM per_user
    """,
)
def analytics_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate and median time to second purchase — the
    two numbers every commerce retention review opens with (one-time
    buyers vs loyalists, and how long the second conversion takes; the
    distribution-level companions are stats_kaplan_meier /
    analytics_retention_cohort).

    Scale shape: purchases are filtered FIRST (pushdown), the per-user
    first/second timestamps come from one rank window partitioned by
    user (hash-parallel) folded into a per-user conditional aggregate,
    and the summary is one aggregate over the buyer frame with an
    exact median (swap approx_percentile at extreme buyer counts —
    the plan above it is unchanged). Gap hours from integer seconds,
    divided once — exact parity.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.row_number().over(w).alias("rn"))
    )
    per_user = ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purch"),
        F.min("ts").alias("first_p"),
        F.min(F.when(F.col("rn") == 2, F.col("ts"))).alias("second_p"),
    )
    repeat = F.when(F.col("n_purch") >= 2, 1).otherwise(0)
    gap_h = F.when(
        F.col("second_p").isNotNull(),
        (F.unix_seconds("second_p") - F.unix_seconds("first_p")) / 3600.0,
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        F.sum(repeat).cast("bigint").alias("n_repeat"),
        F.round(F.sum(repeat) * 1.0 / F.count(F.lit(1)), 6).alias("repeat_rate"),
        F.round(F.percentile(gap_h, F.lit(0.5)), 6).alias(
            "median_hours_to_second"
        ),
    )


@register(
    "analytics_net_revenue_retention",
    oracle="""
    WITH monthly AS (
      SELECT o_custkey AS cust,
             date_trunc('month', o_orderdate) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ),
    paired AS (
      SELECT prev.m AS base_month,
             CAST(sum(prev.cents) AS BIGINT) AS base_cents,
             CAST(sum(coalesce(cur.cents, 0)) AS BIGINT) AS retained_cents
      FROM monthly prev
      LEFT JOIN monthly cur
        ON cur.cust = prev.cust
       AND cur.m = prev.m + INTERVAL 1 MONTH
      GROUP BY prev.m
    )
    SELECT CAST(base_month AS TIMESTAMP) AS base_month,
           round(base_cents / 100.0, 2) AS base_revenue,
           round(retained_cents / 100.0, 2) AS retained_revenue,
           round(CAST(retained_cents AS DOUBLE) / base_cents, 6) AS nrr
    FROM paired
    ORDER BY base_month
    """,
)
def analytics_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention by month: of the customers who spent in
    month M, what fraction of that revenue did the SAME customers spend
    in month M+1 — the SaaS-style dollar-retention readout that
    complements analytics_retention_cohort's user counts (expansion and
    contraction move NRR even when user retention is flat).

    Parity: monthly revenue is exact integer cents; the month-shift join
    is an equi-join on (customer, month+1); sums are exact BIGINT and
    nrr is one IEEE division — round displays. Scale: one
    partial-combinable (customer, month) aggregate, one co-partitioned
    self-join on customer (same-key shuffle reused), one month
    aggregate; no windows over raw facts."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", "o_orderdate").alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("bigint")
        .alias("cents")
    )
    prev = monthly.select(
        F.col("cust").alias("p_cust"), F.col("m").alias("base_month"),
        F.col("cents").alias("p_cents"),
    )
    cur = monthly.select(
        F.col("cust").alias("c_cust"),
        F.col("m").alias("c_m"),
        F.col("cents").alias("c_cents"),
    )
    paired = (
        prev.join(
            cur,
            (F.col("c_cust") == F.col("p_cust"))
            & (F.col("c_m") == F.col("base_month") + F.expr("INTERVAL 1 MONTH")),
            "left",
        )
        .groupBy("base_month")
        .agg(
            F.sum("p_cents").cast("bigint").alias("base_cents"),
            F.sum(F.coalesce(F.col("c_cents"), F.lit(0)))
            .cast("bigint")
            .alias("retained_cents"),
        )
    )
    return paired.select(
        F.col("base_month").cast("timestamp").alias("base_month"),
        F.round(F.col("base_cents") / 100.0, 2).alias("base_revenue"),
        F.round(F.col("retained_cents") / 100.0, 2).alias("retained_revenue"),
        F.round(
            F.col("retained_cents").cast("double") / F.col("base_cents"), 6
        ).alias("nrr"),
    )


@register(
    "analytics_uplift_segments",
    oracle="""
    WITH assigned AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN strpos('01234567',
                              substr(md5('arm:' || CAST(c_custkey AS VARCHAR)),
                                     1, 1)) > 0
                  THEN 1 ELSE 0 END AS treated
      FROM customer
    ),
    conv AS (
      SELECT DISTINCT o_custkey
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    marked AS (
      SELECT a.c_mktsegment, a.treated,
             CASE WHEN c.o_custkey IS NULL THEN 0 ELSE 1 END AS converted
      FROM assigned a LEFT JOIN conv c ON c.o_custkey = a.c_custkey
    ),
    cells AS (
      SELECT c_mktsegment,
             CAST(sum(treated) AS BIGINT)                        AS n_t,
             CAST(sum(treated * converted) AS BIGINT)            AS conv_t,
             CAST(sum(1 - treated) AS BIGINT)                    AS n_c,
             CAST(sum((1 - treated) * converted) AS BIGINT)      AS conv_c
      FROM marked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment AS segment, n_t, n_c,
           round(CAST(conv_t AS DOUBLE) / n_t, 6) AS rate_t,
           round(CAST(conv_c AS DOUBLE) / n_c, 6) AS rate_c,
           round(CAST(conv_t AS DOUBLE) / n_t
                 - CAST(conv_c AS DOUBLE) / n_c, 6) AS uplift,
           round((CAST(conv_t AS DOUBLE) / n_t
                  - CAST(conv_c AS DOUBLE) / n_c)
                 / sqrt((CAST(conv_t AS DOUBLE) / n_t)
                          * (1 - CAST(conv_t AS DOUBLE) / n_t) / n_t
                        + (CAST(conv_c AS DOUBLE) / n_c)
                          * (1 - CAST(conv_c AS DOUBLE) / n_c) / n_c),
                 4) AS z_score
    FROM cells
    ORDER BY segment
    """,
)
def analytics_uplift_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment UPLIFT readout — the two-model (T-learner cell form)
    heterogeneous-treatment-effect table every growth experiment ships:
    customers are assigned to arms by the deterministic md5 coin (the
    stats_ab_srm_check bucketing service), outcome = placed at least
    one 1-URGENT order, and each market segment reports treated/control
    conversion rates, their difference (the segment CATE estimate), and
    a two-proportion z. Segments whose |z| clears the bar are where the
    treatment actually moves behavior — the uplift targeting decision.
    (Assignment here is independent of outcome by construction, so the
    expected uplift is ~0 — a true negative control, like
    analytics_diff_in_diff.)

    Parity: md5 assignment is engine-identical, conversion flags are
    exact integers via a distinct-reduced left join, and every rate /
    z is a fixed IEEE expression over integer cell counts. Scale: the
    conversion set reduces to distinct converters BEFORE the join
    (bounded by |customers|), the join is broadcast-able, and the cell
    table is one partial-combinable conditional aggregate — five rows
    survive.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    assigned = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.instr(
                F.lit("01234567"),
                F.substring(
                    F.md5(F.concat(F.lit("arm:"), F.col("c_custkey").cast("string"))),
                    1,
                    1,
                ),
            )
            > 0,
            1,
        )
        .otherwise(0)
        .alias("treated"),
    )
    conv = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    marked = assigned.join(
        F.broadcast(conv), assigned.c_custkey == conv.o_custkey, "left"
    ).select(
        "c_mktsegment",
        "treated",
        F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("converted"),
    )
    t = F.col("treated")
    cells = marked.groupBy("c_mktsegment").agg(
        F.sum(t).cast("bigint").alias("n_t"),
        F.sum(t * F.col("converted")).cast("bigint").alias("conv_t"),
        F.sum(1 - t).cast("bigint").alias("n_c"),
        F.sum((1 - t) * F.col("converted")).cast("bigint").alias("conv_c"),
    )
    p_t = F.col("conv_t").cast("double") / F.col("n_t")
    p_c = F.col("conv_c").cast("double") / F.col("n_c")
    se = F.sqrt(
        p_t * (1 - p_t) / F.col("n_t") + p_c * (1 - p_c) / F.col("n_c")
    )
    return cells.select(
        F.col("c_mktsegment").alias("segment"),
        "n_t",
        "n_c",
        F.round(p_t, 6).alias("rate_t"),
        F.round(p_c, 6).alias("rate_c"),
        F.round(p_t - p_c, 6).alias("uplift"),
        F.round((p_t - p_c) / se, 4).alias("z_score"),
    ).orderBy("segment")


TRENDING_TOPK = 10


@register(
    "analytics_trending_hyperbolic",
    oracle=f"""
    WITH mx AS (SELECT max(l_shipdate) AS m FROM lineitem),
    aged AS (
      SELECT l_partkey AS part,
             CAST(date_diff('day', l_shipdate, (SELECT m FROM mx))
                  AS BIGINT) AS age,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    scored AS (
      SELECT part,
             CAST(sum(c) AS BIGINT) AS n_events,
             sum(CAST((CAST(c AS HUGEINT) * 1000000000000
                       + (1 + age) // 2) // (1 + age) AS BIGINT)) AS s12
      FROM aged GROUP BY part
    )
    SELECT part, n_events,
           CAST((s12 + 500000) // 1000000 AS BIGINT) AS score_micros
    FROM scored
    ORDER BY s12 DESC, part
    LIMIT {TRENDING_TOPK}
    """,
)
def analytics_trending_hyperbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-now ranking with HYPERBOLIC recency decay: each shipment
    of a part contributes 1/(1 + age_days), so recent activity dominates
    but history never fully dies — the Hacker-News-style freshness score.
    Hyperbolic (rational) decay is chosen deliberately over the usual
    exp(-age/tau): identical trend shape for ranking purposes, but every
    term is a ratio of exact integers, so the score is engine-portable
    (exp is libm — the determinism doctrine).

    Exactness shape (r8 rewrite, same doctrine as the KM integer fold):
    (part, age) compresses the fact stream (ages are calendar-bounded);
    each term is the exact scale-12 integer rhu(c·10^12/(1+age))
    (round-half-up integer division, HUGEINT/DECIMAL38-widened), the
    per-part score is a plain INTEGER sum — order-independent, so no
    ordered fold is needed at all — and both the emitted score_micros
    and the top-k ORDER BY ride the integer, killing the
    equal-rounded-score tie-break hazard of ordering by a raw double.
    Top-k plans as TakeOrderedAndProject.

    Scale shape: one partial-aggregable groupBy to (part, age), one
    shuffle to per-part lists bounded by the CALENDAR (not the corpus),
    top-k with per-task heaps — no global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_shipdate").alias("m"))
    aged = (
        li.crossJoin(F.broadcast(mx))
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.datediff(F.col("m"), F.col("l_shipdate"))
            .cast("bigint")
            .alias("age"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    scored = aged.groupBy("part").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(
            F.expr(
                "CAST((CAST(c AS DECIMAL(38,0)) * 1000000000000"
                " + ((1 + age) DIV 2)) DIV (1 + age) AS BIGINT)"
            )
        ).alias("s12"),
    )
    return (
        scored.select(
            "part",
            "n_events",
            F.expr("CAST((s12 + 500000) DIV 1000000 AS BIGINT)").alias(
                "score_micros"
            ),
            "s12",
        )
        .orderBy(F.col("s12").desc(), "part")
        .limit(TRENDING_TOPK)
        .drop("s12")
    )


SHIFT_SHARE_Y1, SHIFT_SHARE_Y2 = 1996, 2000


@register(
    "analytics_shift_share",
    oracle=f"""
    WITH rev AS (
      SELECT r.r_name AS region,
             CAST(year(o.o_orderdate) AS BIGINT) AS y,
             sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE year(o.o_orderdate) IN ({SHIFT_SHARE_Y1}, {SHIFT_SHARE_Y2})
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT region,
             CAST(sum(CASE WHEN y = {SHIFT_SHARE_Y1} THEN cents ELSE 0 END)
                  AS BIGINT) AS r1,
             CAST(sum(CASE WHEN y = {SHIFT_SHARE_Y2} THEN cents ELSE 0 END)
                  AS BIGINT) AS r2
      FROM rev GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(r1) AS BIGINT) AS t1, CAST(sum(r2) AS BIGINT) AS t2
      FROM wide
    )
    SELECT region,
           round(r1 / 100.0, 2) AS rev_y1,
           round(r2 / 100.0, 2) AS rev_y2,
           round((r2 - r1) / 100.0, 2) AS delta,
           round(r1 * 1.0 * (t2 - t1) / t1 / 100.0, 2) AS national_effect,
           round(((r2 - r1) - r1 * 1.0 * (t2 - t1) / t1) / 100.0, 2)
             AS competitive_shift
    FROM wide, tot
    ORDER BY region
    """,
)
def analytics_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of regional revenue growth between
    {SHIFT_SHARE_Y1} and {SHIFT_SHARE_Y2}: each region's observed change
    splits into the NATIONAL effect (what the region would have gained
    growing at the overall rate, r1 * g_total) and the COMPETITIVE shift
    (the residual — did this region out- or under-perform the market?).
    The BI staple for "did we grow because the market grew, or because
    we took share?".

    Exactness shape: revenues are exact integer cents through the whole
    join tree; the only doubles are the final growth-rate ratio and the
    /100.0 display conversions, identical trees on both engines. The
    two effects sum to delta by construction (pinned in tests).

    Scale shape: the fact-side join hits the customer->nation->region
    dimension chain (bounded dims broadcast); the aggregate compresses
    to O(regions x 2) before any arithmetic.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    y = F.year("o_orderdate").cast("bigint")
    rev = (
        o.filter(y.isin(SHIFT_SHARE_Y1, SHIFT_SHARE_Y2))
        # customer is fact-sized at 100 TB: shuffle equi-join; only the
        # BOUNDED dims (nation=25, region=5) broadcast
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), y.alias("y"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    wide = rev.groupBy("region").agg(
        F.sum(F.when(F.col("y") == SHIFT_SHARE_Y1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.sum(F.when(F.col("y") == SHIFT_SHARE_Y2, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("r2"),
    )
    tot = wide.agg(
        F.sum("r1").cast("bigint").alias("t1"),
        F.sum("r2").cast("bigint").alias("t2"),
    )
    r1, r2 = F.col("r1"), F.col("r2")
    nat_eff = r1 * F.lit(1.0) * (F.col("t2") - F.col("t1")) / F.col("t1")
    return (
        wide.crossJoin(F.broadcast(tot))
        .select(
            "region",
            F.round(r1 / F.lit(100.0), 2).alias("rev_y1"),
            F.round(r2 / F.lit(100.0), 2).alias("rev_y2"),
            F.round((r2 - r1) / F.lit(100.0), 2).alias("delta"),
            F.round(nat_eff / F.lit(100.0), 2).alias("national_effect"),
            F.round(((r2 - r1) - nat_eff) / F.lit(100.0), 2).alias(
                "competitive_shift"
            ),
        )
        .orderBy("region")
    )
