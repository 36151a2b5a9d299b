"""Prefix-filtered set-similarity join: must return EXACTLY the base
operator's pairs (the optimization is lossless by the pigeonhole
argument) while generating measurably fewer candidate pairs."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["name_a", "name_b"]).reset_index(drop=True)
    )


def test_prefix_variant_equals_base(spark, sf_dir):
    base = _canon(REGISTRY["join_fuzzy_trigram"].fn(spark, sf_dir).toPandas())
    pref = _canon(
        REGISTRY["join_fuzzy_trigram_prefix"].fn(spark, sf_dir).toPandas()
    )
    pd.testing.assert_frame_equal(base, pref)


def test_prefix_reduces_candidates(spark, sf_dir):
    """Count candidate pairs from full-index vs prefix-index postings —
    the prefix must cut the candidate set (that's its entire point)."""
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

    def n_cands(postings):
        a = postings.select(F.col("name").alias("na"), "g")
        b = postings.select(F.col("name").alias("nb"), "g")
        return (
            a.join(b, (a["g"] == b["g"]) & (F.col("na") < F.col("nb")))
            .select("na", "nb")
            .distinct()
            .count()
        )

    full = n_cands(tri)
    dfreq = tri.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    ranked = tri.join(dfreq, "g").withColumn(
        "rk", F.row_number().over(Window.partitionBy("name").orderBy("df", "g"))
    )
    sz = tri.groupBy("name").agg(F.count(F.lit(1)).alias("sz"))
    prefix = ranked.join(sz, "name").filter(
        F.col("rk") <= F.col("sz") - F.ceil(0.4 * F.col("sz")) + 1
    )
    pruned = n_cands(prefix)
    assert pruned < full, (pruned, full)
    # the confirmed pairs all survive (lossless) — implied by
    # test_prefix_variant_equals_base, asserted here via counts only
    assert pruned >= len(
        REGISTRY["join_fuzzy_trigram"].fn(spark, sf_dir).toPandas()
    )
