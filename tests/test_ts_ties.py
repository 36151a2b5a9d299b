"""Pinned tie-case tests: ops ranked/picked by event time must stay
deterministic when timestamps collide (VERDICT r3 §What's-wrong 2).

The micros fixtures happen to carry globally-unique ts today, but
correctness must not depend on that: these tests construct explicit
(user_id, ts) ties and assert the deterministic event_id tiebreak.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

TS = dt.datetime(2024, 1, 5, 12, 0, 0)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _tied_events(spark):
    rows = [
        # user 1: two rows tied at TS -> highest event_id must win
        (1, 100, TS, 1.0),
        (1, 101, TS, 2.0),
        (1, 50, TS - dt.timedelta(hours=1), 9.0),
        # user 2: unique times, latest is event 201
        (2, 200, TS - dt.timedelta(minutes=5), 3.0),
        (2, 201, TS, 4.0),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_dedup_latest_tiebreak_is_event_id(spark):
    """Same ordering as window_dedup_latest (timeseries.py): ts DESC,
    event_id DESC — under a ts tie the larger event_id is picked, every run."""
    ev = _tied_events(spark)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    got = {
        r["user_id"]: r["event_id"]
        for r in ev.select(
            "user_id", "event_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == {1: 101, 2: 201}


def test_asof_join_one_row_per_left_under_right_ties(spark):
    """Right-side (key, time) ties must not duplicate left rows, and the
    carried time value must be the tied time itself."""
    from go_batch_processor_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 1000, TS + dt.timedelta(hours=1))],
        T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    right = spark.createDataFrame(
        [(1, TS), (1, TS), (1, TS - dt.timedelta(days=1))],
        T.StructType(
            [
                T.StructField("o_custkey", T.LongType()),
                T.StructField("o_orderdate", T.TimestampType()),
            ]
        ),
    )
    out = asof_join(
        left,
        right,
        on_time=("ts", "o_orderdate"),
        by=("user_id", "o_custkey"),
        value_cols=["o_orderdate"],
        how="inner",
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_o_orderdate"] == TS
