"""Driver-environment diagnostic keys (r8 VERDICT item #1).

The stats_kaplan_meier / stats_nelson_aalen driver-only hash reds were
bisected in round 9 to an output-DTYPE divergence (uncast HUGEINT
``n_risk`` in the oracle -> pandas float64 vs Spark int64; see the KM
docstring in operators/stats.py). These keys stay registered as
falsifiable probes that isolate the three failure layers the verdict
named, so any FUTURE driver-only red localizes in one round:

  diag_constant_canary  — pure literals, no table scan, no arithmetic.
                          A red here means the driver harness itself
                          (snapshot staleness, hash procedure) diverges;
                          no SQL change can ever help.
  diag_km_inputs        — the survival pair's shared upstream: per-
                          duration event/censor/at-risk COUNTS derived
                          only from the events timestamps. A red here
                          (with the canary green) means the driver's
                          DuckDB decodes the events parquet timestamps
                          differently; the survival keys then inherit it.

Rotation contract (r9 verdict item 8 — retirement policy): a probe
rides tier 0 of registry.driver_sample_order only while it is
never-checked or red, because its entire value is bisecting a LIVE
red in the same sample. Both probes went driver-green in r09, so they
are now RETIRED to tier 3 — behind every operator key, never again
occupying one of the 50 sample slots — but stay registered at zero
cost: the latest-FAIL rule re-promotes a probe to tier 0 the moment
any future driver round marks it red, which is exactly when it is
needed again. Pinned in tests/test_round10_fixes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


@register(
    "diag_constant_canary",
    oracle="""
    SELECT CAST(k_int AS BIGINT) AS k_int,
           CAST(k_dbl AS DOUBLE) AS k_dbl,
           k_str,
           CAST(k_ts AS TIMESTAMP) AS k_ts,
           CAST(k_bool AS BOOLEAN) AS k_bool
    FROM (VALUES
        (1, 0.5, 'alpha', TIMESTAMP '2024-01-01 00:00:00', TRUE),
        (6001, 1000000000000.0, 'beta',
         TIMESTAMP '2024-06-15 12:34:56.789012', FALSE),
        (-42, 0.1, 'gamma', TIMESTAMP '2024-12-31 23:59:59', TRUE)
    ) AS t(k_int, k_dbl, k_str, k_ts, k_bool)
    ORDER BY k_int
    """,
    tags={"diagnostic"},
)
def diag_constant_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-literal canary: three fixed rows spanning every scalar
    type the registry's oracles emit — BIGINT, DOUBLE, VARCHAR,
    TIMESTAMP (one with sub-second micros, two without — both
    formatting regimes), BOOLEAN — with no table scan, no aggregation,
    no arithmetic beyond literal parsing. Any driver red on this key is
    a harness-level fault (stale repo snapshot or hash-procedure
    divergence over one of these type surfaces), not a query bug, and
    rules the whole SQL layer out of any concurrent red. The numeric
    literals deliberately include an integer that formats differently
    as float ('6001' vs '6001.0'), a double with an exact binary
    representation question (0.1), and a round power of ten — the
    formatting hazards a stringifying value-hash is sensitive to."""
    import datetime

    rows = [
        (1, 0.5, "alpha", datetime.datetime(2024, 1, 1, 0, 0, 0), True),
        (
            6001,
            1000000000000.0,
            "beta",
            datetime.datetime(2024, 6, 15, 12, 34, 56, 789012),
            False,
        ),
        (-42, 0.1, "gamma", datetime.datetime(2024, 12, 31, 23, 59, 59), True),
    ]
    return spark.createDataFrame(
        rows,
        "k_int long, k_dbl double, k_str string, k_ts timestamp,"
        " k_bool boolean",
    ).orderBy("k_int")


@register(
    "diag_km_inputs",
    oracle="""
    WITH users AS (
      SELECT user_id,
             min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    subjects AS (
      SELECT user_id,
             CASE WHEN tp IS NOT NULL
                   AND date_diff('second', t0, tp) < 48 * 3600
                  THEN CAST(floor(date_diff('second', t0, tp) / 3600.0)
                            AS BIGINT)
                  ELSE CAST(48 AS BIGINT) END AS dur_h,
             CASE WHEN tp IS NOT NULL
                   AND date_diff('second', t0, tp) < 48 * 3600
                  THEN 1 ELSE 0 END AS converted
      FROM users
    ),
    per_dur AS (
      SELECT dur_h,
             CAST(sum(converted) AS BIGINT)     AS n_events,
             CAST(sum(1 - converted) AS BIGINT) AS n_censored
      FROM subjects GROUP BY dur_h
    )
    SELECT dur_h, n_events, n_censored,
           CAST((SELECT count(*) FROM subjects)
             - coalesce(sum(n_events + n_censored) OVER (
                 ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
    FROM per_dur
    ORDER BY dur_h
    """,
    tags={"diagnostic"},
)
def diag_km_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM-inputs diagnostic: the survival suite's shared upstream frame —
    per duration-hour conversion/censor counts and the at-risk set —
    exactly as stats_kaplan_meier / stats_nelson_aalen construct it,
    with every output column CAST to BIGINT. The only inputs are the
    events timestamps (min per user, second-difference, floor to hours),
    so a driver red HERE (canary green) pins any survival-key divergence
    on parquet-timestamp decoding in the driver's DuckDB, while a green
    row certifies the whole upstream and isolates a concurrent survival
    red to the fold/rounding layer downstream."""
    horizon_h = 48
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    gap_s = F.unix_seconds(F.col("tp")) - F.unix_seconds(F.col("t0"))
    is_event = F.col("tp").isNotNull() & (gap_s < horizon_h * 3600)
    subjects = users.select(
        F.when(is_event, F.floor(gap_s / 3600.0))
        .otherwise(F.lit(horizon_h))
        .cast("bigint")
        .alias("dur_h"),
        F.when(is_event, 1).otherwise(0).alias("converted"),
    )
    per_dur = subjects.groupBy("dur_h").agg(
        F.sum("converted").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("converted")).cast("bigint").alias("n_censored"),
    )
    from pyspark.sql import Window

    w_tot = (
        Window.partitionBy()
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_prev = (
        Window.partitionBy()
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_dur.select(
        "dur_h",
        "n_events",
        "n_censored",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("n_risk"),
    ).orderBy("dur_h")
