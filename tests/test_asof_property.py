"""Property-based check of the union+window asof_join against pandas
merge_asof (the de-facto reference implementation of as-of semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_batch_processor_spark.operators.joins import asof_join

KEYS = [0, 1, 2]


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 20))
    n_right = draw(st.integers(0, 20))
    left = [
        (i, draw(st.sampled_from(KEYS)), draw(st.integers(0, 1000)))
        for i in range(n_left)
    ]
    right = [
        (100 + i, draw(st.sampled_from(KEYS)), draw(st.integers(0, 1000)))
        for i in range(n_right)
    ]
    return left, right


@settings(
    max_examples=12,  # each example runs a Spark job; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    left_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "t"])
    right_pdf = pd.DataFrame(right_rows, columns=["rid", "rk", "rt"])

    left = spark.createDataFrame(left_pdf, schema="lid long, k long, t long")
    right = spark.createDataFrame(
        right_pdf.assign(payload=right_pdf["rt"]),
        schema="rid long, rk long, rt long, payload long",
    )

    got = asof_join(
        left,
        right,
        on_time=("t", "rt"),
        by=("k", "rk"),
        value_cols=["payload"],
        how="inner",
    ).toPandas()

    if len(right_pdf):
        want = pd.merge_asof(
            left_pdf.sort_values("t"),
            right_pdf.assign(payload=right_pdf["rt"]).sort_values("rt"),
            left_on="t",
            right_on="rt",
            left_by="k",
            right_by="rk",
            direction="backward",
        ).dropna(subset=["payload"])
        want_set = {
            (r.lid, int(r.payload)) for r in want.itertuples()
        }
    else:
        want_set = set()
    got_set = {(r.lid, int(r.asof_payload)) for r in got.itertuples()}
    assert got_set == want_set


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_keyless_asof_matches_pandas_on_multipartition_input(spark, case):
    """by=None path: must be correct on MULTI-partition frames (the
    time-bucketed carry, not a single global window)."""
    left_rows, right_rows = case
    left_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "t"])
    right_pdf = pd.DataFrame(right_rows, columns=["rid", "rk", "rt"])

    left = spark.createDataFrame(
        left_pdf, schema="lid long, k long, t long"
    ).repartition(8)
    right = spark.createDataFrame(
        right_pdf.assign(payload=right_pdf["rt"]),
        schema="rid long, rk long, rt long, payload long",
    ).repartition(8)

    got = asof_join(
        left,
        right,
        on_time=("t", "rt"),
        by=None,
        value_cols=["payload"],
        how="inner",
    ).toPandas()

    if len(right_pdf):
        want = pd.merge_asof(
            left_pdf.sort_values("t"),
            right_pdf.assign(payload=right_pdf["rt"]).sort_values("rt"),
            left_on="t",
            right_on="rt",
            direction="backward",
        ).dropna(subset=["payload"])
        want_set = {(r.lid, int(r.payload)) for r in want.itertuples()}
    else:
        want_set = set()
    got_set = {(r.lid, int(r.asof_payload)) for r in got.itertuples()}
    assert got_set == want_set


def test_keyless_asof_plan_has_no_global_window(spark):
    """The keyless plan must not move all rows into one window partition:
    every Window node should partition by the time bucket."""
    left = spark.range(0, 1000).selectExpr("id AS lid", "id * 3 AS t")
    right = spark.range(0, 100).selectExpr(
        "id AS rid", "id * 31 AS rt", "id AS payload"
    )
    out = asof_join(
        left, right, on_time=("t", "rt"), by=None, value_cols=["payload"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # Window specs over the full union must carry a partition key (_bkt);
    # the only unpartitioned window allowed is the O(#buckets) carry table.
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "_ls" in spec:
            continue  # bucket-table carry: bounded by #buckets
        assert "_bkt" in spec, f"unpartitioned window over row data: {spec}"


def test_keyless_asof_null_value_cols_carry_per_column(spark):
    """A NULL in one value column on a bucket's LATEST right row must not
    mask an earlier non-null value of that column when carried into later
    buckets — keyless carry-in is per column, matching the keyed path's
    per-column last(ignorenulls)."""
    right = spark.createDataFrame(
        [(1, 1, 10), (2, None, 20), (3, 3, None)],
        schema="rt long, a long, b long",
    )
    # Lefts far after all rights: their values come ONLY from cross-bucket
    # carry-in (the rights sit in bucket 0, the lefts hundreds of buckets
    # later), which is exactly where the whole-struct carry diverged.
    left = spark.createDataFrame([(1000,), (2000,)], schema="t long")
    out = (
        asof_join(left, right, on_time=("t", "rt"), by=None, value_cols=["a", "b"])
        .orderBy("t")
        .collect()
    )
    assert [(r["asof_a"], r["asof_b"]) for r in out] == [(3, 20), (3, 20)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_salted_keyed_asof_matches_plain_keyed(spark, case):
    """salt_time=True must return exactly the plain keyed path's rows."""
    left_rows, right_rows = case
    left_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "t"])
    right_pdf = pd.DataFrame(right_rows, columns=["rid", "rk", "rt"])
    left = spark.createDataFrame(left_pdf, schema="lid long, k long, t long")
    right = spark.createDataFrame(
        right_pdf.assign(payload=right_pdf["rt"]),
        schema="rid long, rk long, rt long, payload long",
    )
    kw = dict(on_time=("t", "rt"), by=("k", "rk"), value_cols=["payload"], how="inner")
    plain = asof_join(left, right, **kw).toPandas()
    salted = asof_join(left, right, salt_time=True, **kw).toPandas()
    key = lambda df: sorted(map(tuple, df[["lid", "asof_payload"]].itertuples(index=False)))
    assert key(salted) == key(plain)


def test_salted_keyed_asof_splits_hot_key_across_tasks(spark):
    """A deliberately skewed by-key (one key owning ~all rows) must NOT
    collapse into a single window partition: every window over row data
    partitions by (_k, _bkt), and the hot key's rows actually spread
    across many buckets (no single-task straggler)."""
    import re

    from pyspark.sql import functions as F

    n = 20_000
    left = spark.range(n).selectExpr(
        "id AS lid", "CAST(id % 100 = 0 AS LONG) * id AS k0", "id AS t"
    ).selectExpr("lid", "0 AS k", "t")  # every row the same hot key
    right = spark.range(0, n, 10).selectExpr(
        "id AS rid", "0 AS rk", "id AS rt", "id AS payload"
    )
    out = asof_join(
        left, right, on_time=("t", "rt"), by=("k", "rk"),
        value_cols=["payload"], salt_time=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "_ls" in spec:
            continue  # bucket-table carry: bounded by #groups x #buckets
        assert "_bkt" in spec, f"hot key still in one window partition: {spec}"
    # semantic spot-check: payload = t rounded down to a multiple of 10
    rows = out.orderBy("lid").limit(100).collect()
    assert all(r["asof_payload"] == (r["t"] // 10) * 10 for r in rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case(), st.one_of(st.none(), st.integers(1, 50)))
def test_forward_asof_matches_pandas(spark, case, tol):
    """direction='forward' (with and without tolerance) must agree with
    pandas merge_asof(direction='forward') — timestamps at micro
    precision exercise the epoch-micros negation path."""
    from hypothesis import assume
    from pyspark.sql import functions as F

    left_rows, right_rows = case
    assume(len(right_rows) > 0)  # empty right: schema inference has no rows
    left_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "t"])
    right_pdf = pd.DataFrame(right_rows, columns=["rid", "rk", "rt"])
    left_pdf["ts"] = pd.to_datetime(left_pdf["t"], unit="s")
    right_pdf["rts"] = pd.to_datetime(right_pdf["rt"], unit="s")

    expected = pd.merge_asof(
        left_pdf.sort_values(["ts", "lid"]),
        right_pdf.sort_values("rts")[["rk", "rts"]].rename(columns={"rts": "m"}),
        left_on="ts",
        right_on="m",
        left_by="k",
        right_by="rk",
        direction="forward",
        allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
    ).dropna(subset=["m"])

    lf = spark.createDataFrame(left_pdf[["lid", "k", "ts"]])
    rf = spark.createDataFrame(right_pdf[["rid", "rk", "rts"]])
    got = (
        asof_join(
            lf,
            rf,
            on_time=("ts", "rts"),
            by=("k", "rk"),
            value_cols=["rts"],
            how="inner",
            tolerance_s=tol,
            direction="forward",
        )
        .select("lid", F.col("asof_rts").alias("m"))
        .toPandas()
    )
    exp = expected[["lid", "m"]].sort_values("lid").reset_index(drop=True)
    got = got.sort_values("lid").reset_index(drop=True)
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_forward_salted_asof_matches_plain_forward(spark):
    """direction='forward' composed with salt_time=True (the hot-key
    escape hatch) must agree with the plain forward path — the negation
    wrapper hands both through the same backward machinery."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = 3000
    left_pdf = pd.DataFrame(
        {
            "lid": range(n),
            "k": [0] * n,  # one hot key
            "ts": pd.to_datetime([i * 7 % 50_000 for i in range(n)], unit="s"),
        }
    )
    right_pdf = pd.DataFrame(
        {
            "rid": range(500),
            "rk": [0] * 500,
            "rts": pd.to_datetime([i * 100 for i in range(500)], unit="s"),
        }
    )
    lf = spark.createDataFrame(left_pdf)
    rf = spark.createDataFrame(right_pdf)

    def run(salt):
        return (
            asof_join(
                lf,
                rf,
                on_time=("ts", "rts"),
                by=("k", "rk"),
                value_cols=["rts"],
                how="inner",
                direction="forward",
                salt_time=salt,
            )
            .select("lid", F.col("asof_rts").alias("m"))
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(False), run(True))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_nearest_matches_pandas(spark, case):
    """asof_join_nearest vs pandas merge_asof(direction='nearest'), with a
    payload distinct from the time axis (exercises the separate time
    carry). Note pandas breaks exact-gap ties backward, same as ours."""
    from go_batch_processor_spark.operators.joins import asof_join_nearest

    left_rows, right_rows = case
    left_pdf = pd.DataFrame(left_rows, columns=["lid", "k", "t"])
    right_pdf = pd.DataFrame(right_rows, columns=["rid", "rk", "rt"])
    left_pdf["t"] = pd.to_datetime(left_pdf["t"], unit="s")
    right_pdf["rt"] = pd.to_datetime(right_pdf["rt"], unit="s")
    right_pdf = right_pdf.assign(payload=right_pdf["rid"] * 1000)
    # pandas merge_asof by-key requires unique (rk, rt) for a well-defined
    # nearest pick; drop dup times per key the same way on both sides.
    right_pdf = right_pdf.drop_duplicates(subset=["rk", "rt"], keep="first")

    left = spark.createDataFrame(
        left_pdf, schema="lid long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        right_pdf, schema="rid long, rk long, rt timestamp, payload long"
    )
    got = asof_join_nearest(
        left,
        right,
        on_time=("t", "rt"),
        by=("k", "rk"),
        value_col="payload",
    ).toPandas()

    if len(right_pdf):
        want = pd.merge_asof(
            left_pdf.sort_values(["t", "lid"]),
            right_pdf.sort_values("rt"),
            left_on="t",
            right_on="rt",
            left_by="k",
            right_by="rk",
            direction="nearest",
        ).dropna(subset=["payload"])
        want_set = {(r.lid, int(r.payload)) for r in want.itertuples()}
    else:
        want_set = set()
    got_set = {(r.lid, int(r.nearest_payload)) for r in got.itertuples()}
    assert got_set == want_set
