"""Similarity search over the ``embeddings`` table (north-star §2.2.i).

  similarity_topk_cosine — brute-force cosine top-k against a probe vector,
                           all JVM-side (zip_with + aggregate fold, doubles);
                           DuckDB oracle via unnest re-derivation.
  similarity_ann_lsh     — random-hyperplane LSH bucketing, then exact
                           cosine only within buckets: the sub-linear scale
                           path (candidates ~ n/2^planes per probe).

Scale notes: brute force is one scan, no shuffle (probe broadcast) — at
100 TB that is still viable for single-probe queries (scan-bound), while
the LSH variant cuts candidate counts for batched all-pairs workloads.
Floats are cast to double before arithmetic (exact) so Spark and the
oracle accumulate at the same precision.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register

PROBE_VEC_ID = 0
TOP_K = 10
LSH_PLANES = 8
LSH_SEED = 42
EMB_DIM = 64


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    embeddings: DataFrame, probe: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k of every probe row against the corpus.

    The probe side is broadcast (it is small by construction); the corpus
    never shuffles — one scan + TakeOrderedAndProject.
    """
    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    p = probe.select(
        F.col("vec_id").alias("probe_id"), _as_double(F.col("embedding")).alias("pemb")
    )
    cos = _dot(F.col("emb"), F.col("pemb")) / (
        _norm(F.col("emb")) * _norm(F.col("pemb"))
    )
    return (
        e.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


@register(
    "similarity_topk_cosine",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    probe AS (SELECT i, v FROM flat WHERE vec_id = {PROBE_VEC_ID}),
    dots AS (
      SELECT f.vec_id,
             sum(f.v * p.v) AS dot,
             sqrt(sum(f.v * f.v)) AS nrm
      FROM flat f JOIN probe p ON f.i = p.i
      GROUP BY f.vec_id
    ),
    pn AS (SELECT sqrt(sum(v * v)) AS nrm FROM probe)
    SELECT d.vec_id, round(d.dot / (d.nrm * pn.nrm), 6) AS cosine
    FROM dots d, pn
    WHERE d.vec_id <> {PROBE_VEC_ID}
    ORDER BY cosine DESC, d.vec_id ASC
    LIMIT {TOP_K}
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of the vec_id=0 embedding (exact, brute force)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID)
    return cosine_topk(emb, probe, TOP_K)


def _hyperplanes(n_planes: int = LSH_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed, generated driver-side
    once — a few KB of literals, folded into the plan as constants)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


@register("similarity_ann_lsh", tags={"rows_only"})
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor via random-hyperplane LSH.

    Every vector gets an 8-bit bucket signature (sign of dot with 8 fixed
    hyperplanes); exact cosine runs only within buckets; returns each
    vector's best within-bucket neighbor. Deterministic (seed 42); rows-only
    (bucketing is engine-specific by construction).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    planes = _hyperplanes()
    sig = F.concat_ws(
        "",
        *[
            F.when(_dot(F.col("emb"), F.array(*[F.lit(v) for v in plane])) > 0, "1")
            .otherwise("0")
            for plane in planes
        ],
    )
    bucketed = emb.select("vec_id", "emb", sig.alias("bucket"))

    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        _norm(F.col("a.emb")) * _norm(F.col("b.emb"))
    )
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "neighbor_id", "cosine")
    )
