"""Property tests for the dist_rank infrastructure on ADVERSARIAL value
distributions (r10 — the graph-adversarial lesson applied to the most
load-bearing helper in the repo: ~10 keys rank or cumsum through it).
The existing tests pin fixture-shaped data; hypothesis drives heavy
ties, extreme skew (90% one value), negatives, single rows, and
all-equal columns, where quantile boundaries collide and buckets
degenerate — exactly where a literal-boundary bucketing scheme would
break if ties could straddle buckets."""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from go_batch_processor_spark.dist_rank import (
    distributed_group_cumsum,
    distributed_row_number,
)

# Small alphabets force massive ties; the wide branch exercises spread
# boundaries. Sizes stay small: each example is a full Spark round-trip.
values = st.one_of(
    st.integers(min_value=-3, max_value=3),
    st.integers(min_value=-10_000, max_value=10_000),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=st.lists(values, min_size=1, max_size=60))
def test_row_number_matches_global_window_any_distribution(spark, xs):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "id long, x long"
    )
    got, n = distributed_row_number(
        df, "x", [F.col("x").asc(), F.col("id").asc()], "rn", nbuckets=4
    )
    w = Window.partitionBy().orderBy(F.col("x").asc(), F.col("id").asc())
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert n == len(xs)
    assert {r.id: r.rn for r in got.collect()} == {
        r.id: r.rn for r in want.collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)),  # (group, key)
        st.integers(min_value=-5, max_value=100),            # val
        min_size=1,
        max_size=50,
    )
)
def test_group_cumsum_matches_window_any_distribution(spark, pairs):
    rows = [(g, k, v) for (g, k), v in pairs.items()]
    df = spark.createDataFrame(rows, "g int, k long, v long")
    got = distributed_group_cumsum(df, "g", "k", "v", "cum", nbuckets=4)
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert {(r.g, r.k): r.cum for r in got.collect()} == {
        (r.g, r.k): r.cum for r in want.collect()
    }
