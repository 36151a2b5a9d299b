"""UDF surface (SURVEY.md §2.2.k) — the generalization of the reference's
``Processor.ProcessBatch`` (/root/reference/batch_processor.go:21-23), which
is a black-box table-in/table-out function over one batch.

Spark mapping:
  udf_scalar_pandas — vectorized scalar transform (Arrow batches, the ONLY
                      acceptable Python-in-row-path shape at 100 TB)
  udf_grouped_map   — groupBy().applyInPandas: the direct ProcessBatch
                      analog (pandas DataFrame in -> pandas DataFrame out)
  udtf_explode_props— one-to-many expansion (JVM explode of parsed JSON map;
                      the UDTF shape without leaving codegen)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


@F.pandas_udf(T.DoubleType())
def _standardize(v: pd.Series) -> pd.Series:
    # Fixed affine transform: exact IEEE ops, bit-identical to the SQL twin.
    return (v - 100.0) / 15.0


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT event_id, value, (value - 100.0) / 15.0 AS value_std
    FROM events
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow-batched) applying a fixed affine
    standardization; per-row double ops are engine-exact so the oracle is the
    plain SQL expression."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value", _standardize("value").alias("value_std"))


_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)  # sample stddev == stddev_samp
    pdf = pdf[["event_id", "event_type", "value"]].copy()
    pdf["zscore"] = ((pdf["value"] - mean) / std).round(4)
    return pdf


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, event_type, value,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalize via applyInPandas — the direct ProcessBatch analog
    (table in, table out per group). Oracle via window aggregates; the
    group mean/std are rounded at 4 digits to absorb summation-order noise."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(_zscore_group, _GROUP_SCHEMA)


@register(
    "udtf_explode_props",
    oracle="""
    SELECT event_id, 'k' AS prop_key, CAST(props->>'k' AS BIGINT) AS prop_value
    FROM events
    WHERE props->>'k' IS NOT NULL
    """,
)
def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many expansion of the parsed props JSON map (UDTF shape).

    JVM-side: from_json -> explode, no Python. The oracle hardcodes the
    single fixture key 'k' (DuckDB build here lacks json_each).
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", T.MapType(T.StringType(), T.LongType())).alias("m"),
    )
    return parsed.select(
        "event_id", F.explode("m").alias("prop_key", "prop_value")
    ).filter(F.col("prop_value").isNotNull())


@F.udtf(returnType="doc_id bigint, metric string, value double")
class _DocMetricsUDTF:
    """Python UDTF (Spark >= 3.5): one input row -> several metric rows."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        words = text.split(" ")
        yield doc_id, "n_words", float(len(words))
        yield doc_id, "n_chars_nospace", float(sum(len(w) for w in words))
        yield doc_id, "max_word_len", float(max(len(w) for w in words))


@register(
    "udtf_python_doc_metrics",
    oracle="""
    SELECT doc_id, 'n_words' AS metric,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS value FROM documents
    UNION ALL
    SELECT doc_id, 'n_chars_nospace',
           CAST(length(replace(text, ' ', '')) AS DOUBLE) FROM documents
    UNION ALL
    SELECT doc_id, 'max_word_len',
           CAST(list_max(list_transform(string_split(text, ' '),
                w -> length(w))) AS DOUBLE) FROM documents
    """,
)
def udtf_python_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF via LATERAL join: per-doc metric expansion.

    This is the slow path by design (demonstrates the surface); the same
    metrics are computable JVM-side (see text_quality_score) — the UDTF
    shape exists for logic that genuinely needs Python."""
    from go_batch_processor_spark.catalog import register_views

    register_views(spark, sf_dir, "documents")
    spark.udtf.register("doc_metrics", _DocMetricsUDTF)
    return spark.sql(
        "SELECT m.doc_id, m.metric, m.value "
        "FROM documents, LATERAL doc_metrics(doc_id, text) m"
    )
