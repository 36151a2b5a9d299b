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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register

PROBE_VEC_ID = 0
TOP_K = 10
LSH_PLANES = 8
LSH_SEED = 42
EMB_DIM = 64
IVF_CELLS = 16
IVF_NPROBE = 2

# Production index sizing (SCALE.md "ANN index-parameter doctrine").
# The fixture constants above (IVF_CELLS=16, LSH_PLANES=8, nprobe=2) are
# FIXTURE-sized so the recall twins stay deterministic on 600-60k-vector
# test corpora; at scale the knobs come from these formulas instead.
IVF_NLIST_MIN = 16           # below this, brute force beats the index
IVF_NLIST_MAX = 1 << 18      # 262144 cells: centroid table stays broadcastable
CENTROID_BROADCAST_BUDGET = 256 << 20  # bytes; executor broadcast comfort zone


def ivf_nlist(n_vectors: int, dim: int = EMB_DIM) -> int:
    """Production nlist for an IVF index over ``n_vectors`` embeddings.

    Doctrine (Faiss guidelines; Jégou et al. 2011): nlist ~= sqrt(N)
    balances the two scan costs — coarse assignment touches nlist
    centroids, the probe touches nprobe * (N / nlist) vectors; their sum
    is minimized at nlist = sqrt(nprobe * N) ~ sqrt(N). Clamped to
    [IVF_NLIST_MIN, IVF_NLIST_MAX] and additionally capped so the f64
    centroid table (nlist * dim * 8 bytes) never exceeds
    CENTROID_BROADCAST_BUDGET — the table must broadcast to every
    executor, so it scales with sqrt(corpus), NEVER with corpus:
    at N = 10^12 (a ~100 TB embedding corpus) sqrt(N) = 10^6 hits the
    256 MiB budget cap at 2^18 cells x 64 dims = 128 MiB. Recall is then
    bought with nprobe (recall ~ fraction of probe mass covered; nprobe
    = 8-64 typical for 90-99% recall@10), which multiplies query cost
    linearly but leaves the broadcast table size unchanged.
    """
    import math

    by_sqrt = int(math.isqrt(max(int(n_vectors), 1)))
    by_budget = CENTROID_BROADCAST_BUDGET // (dim * 8)
    return max(IVF_NLIST_MIN, min(by_sqrt, IVF_NLIST_MAX, by_budget))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# r14 NEGATIVE RESULT (measured, reverted): an unrolled SQL twin of
# _dot for fixed 64-dim vectors — ``0.0 + a[0]*b[0] + a[1]*b[1] + ...``
# as one F.expr parse — was landed on similarity_knn_classifier's
# all-pairs dot on the theory that the interpreted HOF fold (per-row
# array+lambda churn) dominates. Interleaved A/B at sf0.1 measured the
# unrolled form 4.0x SLOWER (1.99 s -> 7.97 s solo; driver-style bench
# 2.56 -> 8.42 s): 64 independent GetArrayItem evaluations each repay
# null/bounds checks and the resulting 129-node expression tree blows
# past codegen's method-split budget, while the fold walks both arrays
# once. Keep the HOF fold; it is also the bit-exactness contract
# (left-to-right accumulation from a 0.0 seed).


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


COSINE_DUP_THRESHOLD = 0.4  # fixture corpus has no planted vector dups;
# 0.4 sits in a >1e-3 gap of the pair-cosine distribution, so float-vs-double
# noise can never flip membership.


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
      FROM flat a
      JOIN flat b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON vec_a = na.vec_id
    JOIN norms nb ON vec_b = nb.vec_id
    WHERE dot / (na.nrm * nb.nrm) >= {COSINE_DUP_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label.

    Blocking (here: the label column; in production: an LSH bucket or IVF
    cell) is what makes all-pairs cosine feasible at 100 TB — the join
    explodes only within blocks, never across the full corpus. The unblocked
    scale path is similarity_ann_lsh's bucketing.
    """
    # Norms precomputed once per vector (r9 knn_classifier lesson).
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", _as_double(F.col("embedding")).alias("emb"))
        .withColumn("nrm", _norm(F.col("emb")))
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("_cos", 6).alias("cosine"))
    )


def _hyperplanes(n_planes: int = LSH_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed, generated driver-side
    once — a few KB of literals, folded into the plan as constants)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


@register("similarity_ivf_topk", tags={"rows_only"})
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition the corpus into coarse cells, probe only the
    nprobe nearest cells — the classic sub-linear index shape.

    Centroid seeding is deterministic (the IVF_CELLS lowest vec_ids stand in
    for k-means centroids; production would Lloyd-iterate them). Collecting
    the centroids driver-side is bounded (IVF_CELLS x EMB_DIM floats) and is
    the standard pattern: centroids broadcast as plan literals, the corpus
    never shuffles for assignment. Rows-only (index layout is engine-
    specific); recall is asserted against brute force in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    centroids = [
        (int(r.vec_id), [float(x) for x in r.emb])
        for r in emb.filter(F.col("vec_id") < IVF_CELLS).collect()
    ]

    def cell_of(col: Column) -> Column:
        # struct(dot, cid): array_max compares lexicographically -> argmax.
        scored = F.array(
            *[
                F.struct(
                    _dot(col, F.array(*[F.lit(v) for v in vec])).alias("dot"),
                    F.lit(cid).alias("cid"),
                )
                for cid, vec in centroids
            ]
        )
        return F.array_max(scored).getField("cid")

    assigned = emb.select("vec_id", "emb", cell_of(F.col("emb")).alias("cell"))

    probe_vec = next(v for cid, v in centroids if cid == PROBE_VEC_ID)
    probe_np = np.asarray(probe_vec)
    cent_ids = np.asarray([cid for cid, _ in centroids])
    cent_mat = np.asarray([v for _, v in centroids])
    dots = cent_mat @ probe_np
    probe_cells = [int(c) for c in cent_ids[np.argsort(-dots)][:IVF_NPROBE]]

    p = F.array(*[F.lit(v) for v in probe_vec])
    cos = _dot(F.col("emb"), p) / (_norm(F.col("emb")) * _norm(p))
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


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
    bucketed = emb.select(
        "vec_id", "emb", sig.alias("bucket"), _norm(F.col("emb")).alias("nrm")
    )

    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        F.col("a.nrm") * F.col("b.nrm")
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


ASSIGN_K = 16  # fixed centroid count — scale-invariant (stand-in for k-means)


@register(
    "similarity_centroid_assign",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    cflat AS (SELECT vec_id AS cid, v, i FROM flat WHERE vec_id < {ASSIGN_K}),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY vec_id),
    dots AS (
      SELECT f.vec_id, c.cid, sum(f.v * c.v) AS dot
      FROM flat f JOIN cflat c ON f.i = c.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.vec_id, d.cid, d.dot / (n1.nrm * n2.nrm) AS cos
      FROM dots d
      JOIN norms n1 ON d.vec_id = n1.vec_id
      JOIN norms n2 ON d.cid = n2.vec_id
    ),
    r AS (
      SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS rn
      FROM scored
    )
    SELECT vec_id, cid AS centroid_id, round(cos, 6) AS cosine
    FROM r WHERE rn = 1
    """,
)
def similarity_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment — the IVF/k-means building block as an
    ORACLED query (the rows-only `similarity_ivf_topk` composes it).

    The centroid set is FIXED-K (the K lowest vec_ids stand in for trained
    k-means centroids), so it stays a broadcast regardless of corpus size:
    each of the 100 TB of vectors streams map-side through K fused
    dot-products (JVM higher-order fold, no UDF) and a per-vec_id top-1.
    The top-1 is a `max_by` aggregate over a (cos, -cid) ordering struct —
    a declarative aggregate with a map-side partial, so the K x N scored
    rows collapse to N BEFORE the exchange (a rank-1 window here would
    shuffle all K x N amplified rows and sort each group).
    Tie-break on (cos DESC, cid ASC) keeps the pick deterministic on both
    engines; dot products fold dims in index order on both, so the doubles
    compare identically.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    cents = e.filter(F.col("vec_id") < ASSIGN_K).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    cos = _dot(F.col("emb"), F.col("cemb")) / (_norm(F.col("emb")) * _norm(F.col("cemb")))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cos.alias("cos")
    )
    # (cos DESC, cid ASC) == max over the lexicographic (cos, -cid) struct.
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("cid", "cos"),
            F.struct(F.col("cos").alias("c"), (-F.col("cid")).alias("t")),
        ).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.cid").alias("centroid_id"),
        F.round("b.cos", 6).alias("cosine"),
    )


@register("similarity_quantize_int8", tags={"rows_only"})
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension) int8 quantization of the embedding corpus —
    the SQ8 compression every large-scale vector index (FAISS, Lucene
    HNSW) applies before ANN search, cutting vector storage 4x. Each
    dimension is affinely mapped onto 0..255 using its global min/max;
    the query reports per-vector reconstruction error, and
    tests/test_quantize.py asserts the max error stays within the
    half-step bound scale_d/2 that the rounding guarantees.

    Scale shape: the per-dim stats are ONE aggregation whose output is
    EMB_DIM rows (posexplode fans out corpus x dim pairs, but partial
    aggregation collapses each partition to <= dim rows before the
    exchange); the stats fold into two small arrays broadcast onto the
    corpus, and quantize/dequantize/error are pure columnar array
    expressions — whole-stage codegen, zero Python, no second wide
    shuffle. Codes would be written as array<tinyint> in a real sink;
    here the error metric keeps the output hash-stable (arrays in
    outputs break the pandas compare — registry parity rules)."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    )
    stats = (
        dims.groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mn"))), lambda s: s.mn
            ).alias("mins"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mx"))), lambda s: s.mx
            ).alias("maxs"),
        )
    )
    err = F.expr(
        """
        transform(sequence(0, size(embedding) - 1), i ->
          abs(
            CAST(element_at(embedding, i + 1) AS DOUBLE)
            - (
                CAST(element_at(mins, i + 1) AS DOUBLE)
                + round(
                    (CAST(element_at(embedding, i + 1) AS DOUBLE)
                     - CAST(element_at(mins, i + 1) AS DOUBLE))
                    / (greatest(CAST(element_at(maxs, i + 1) AS DOUBLE)
                                - CAST(element_at(mins, i + 1) AS DOUBLE), 1e-12) / 255.0)
                  )
                  * (greatest(CAST(element_at(maxs, i + 1) AS DOUBLE)
                              - CAST(element_at(mins, i + 1) AS DOUBLE), 1e-12) / 255.0)
              )
          )
        )
        """
    )
    return (
        e.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.round(F.array_max(err), 8).alias("max_abs_err"),
            F.round(
                F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("embedding"),
                8,
            ).alias("mean_abs_err"),
        )
    )


PQ_SUBSPACES = 8  # M: 64 dims -> 8 subspaces of 8 dims
PQ_CODEBOOK_K = 16  # K per subspace -> 1 byte/code
PQ_ITERS = 2


def _pq_train(train: DataFrame, m: int, k: int, iters: int) -> list:
    """Train ALL m subspace codebooks jointly: per Lloyd iteration ONE
    Arrow pass assigns every (vector, subspace) pair and reduces each
    partition to <= m*k (sum, count) partial rows — 8 independent
    k-means runs for the job count of one (the fixed per-job overhead,
    not data volume, dominates M sequential small trainings; measured
    28 s -> ~4 s at sf0.01).

    Returns codebooks[m] = list of k centroids (each sub_dim floats).
    Seeds: the k lowest-vec_id training vectors, sliced per subspace —
    deterministic, matching ml.kmeans_lloyd's convention."""
    import numpy as np

    seed_rows = train.orderBy("vec_id").limit(k).select("full").collect()
    full_dim = len(seed_rows[0]["full"])
    sub = full_dim // m
    C = np.array(
        [[list(r["full"][j * sub : (j + 1) * sub]) for r in seed_rows] for j in range(m)],
        dtype=np.float64,
    )  # (m, k, sub)

    train = train.persist()
    try:
        for _ in range(iters):
            cent = C.copy()

            def step(it):
                import numpy as np
                import pandas as pd

                sums = np.zeros_like(cent)
                counts = np.zeros((m, k), dtype=np.int64)
                for pdf in it:
                    if not len(pdf):
                        continue
                    X = np.array(
                        [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                    ).reshape(len(pdf), m, sub)
                    for j in range(m):
                        a = (
                            ((X[:, j, None, :] - cent[j][None, :, :]) ** 2)
                            .sum(axis=2)
                            .argmin(axis=1)
                        )
                        for c in range(k):
                            pts = X[a == c, j, :]
                            if len(pts):
                                sums[j, c] += pts.sum(axis=0)
                                counts[j, c] += len(pts)
                j_idx, c_idx = np.nonzero(counts)
                yield pd.DataFrame(
                    {
                        "m": np.repeat(j_idx, sub),
                        "cluster": np.repeat(c_idx, sub),
                        "pos": np.tile(np.arange(sub), len(j_idx)),
                        "s": np.concatenate(
                            [sums[j, c] for j, c in zip(j_idx, c_idx)]
                        )
                        if len(j_idx)
                        else [],
                        "n": np.repeat(counts[j_idx, c_idx], sub),
                    }
                )

            rows = (
                train.select("full")
                .mapInPandas(step, "m int, cluster int, pos int, s double, n long")
                .groupBy("m", "cluster", "pos")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            for r in rows:
                C[r["m"], r["cluster"], r["pos"]] = r["s"] / r["n"]
    finally:
        train.unpersist(blocking=False)
    return [[list(map(float, C[j, c])) for c in range(k)] for j in range(m)]


@register("similarity_pq_codebook", tags={"rows_only"})
def similarity_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebooks (Jegou et al. 2011): the embedding is
    split into M={PQ_SUBSPACES} subspaces, each quantized by its own
    K={PQ_CODEBOOK_K}-centroid k-means codebook — M*log2(K) bits per
    vector (8 bytes here vs 256 for float32, a 32x cut) with far lower
    distortion than scalar quantization at the same budget. This is the
    compression behind IVF-PQ ANN indexes at billion-vector scale.

    Scale shape: codebooks train on a deterministic 25% md5-nibble sample
    (FAISS practice: train on a sample, encode everything) with ALL
    subspaces trained jointly — one Arrow sufficient-stats pass per Lloyd
    iteration, <= M*K partial rows per partition, so the whole training is
    seeds + iters + 1 jobs regardless of M. Reconstruction error is a
    single JVM pass: per subspace an array_min over K centroid-literal
    distances (no join, no shuffle, no Python in the output plan).

    Rows-only (iterative); tests/test_quantize.py asserts PQ beats scalar
    quantization's distortion at the same byte budget and that training
    is deterministic."""
    from go_batch_processor_spark.operators.ml import _as_double

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("full")
    )
    train = emb.filter(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    )
    codebooks = _pq_train(train, PQ_SUBSPACES, PQ_CODEBOOK_K, PQ_ITERS)
    # Encode + reconstruction error in ONE Arrow pass: the JVM-literal
    # alternative (M*K HOF distance chains) spends >10 s in whole-stage
    # codegen COMPILATION for a 1.5 MB task binary — dense-linalg is the
    # documented exception where the numpy kernel wins (see
    # ml._lloyd_partials); same batched matmul shape here.
    import numpy as np

    books = np.array(codebooks, dtype=np.float64)  # (m, k, sub)
    m, k, sub = books.shape

    def encode_err(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
            ).reshape(len(pdf), m, sub)
            err = np.zeros(len(pdf))
            for j in range(m):
                d2 = ((X[:, j, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                err += d2.min(axis=1)
            yield pd.DataFrame({"err": err})

    errs = emb.select("full").mapInPandas(encode_err, "err double")
    return errs.agg(
        F.lit(PQ_SUBSPACES).alias("m_subspaces"),
        F.lit(PQ_CODEBOOK_K).alias("k_per_subspace"),
        F.lit(PQ_SUBSPACES).alias("code_bytes_per_vec"),
        F.round(F.avg(F.col("err") / EMB_DIM), 6).alias("mean_mse"),
        F.round(F.max(F.col("err") / EMB_DIM), 6).alias("max_mse"),
    )


IVFPQ_NPROBE = 4

# ---------------------------------------------------------------------------
# Index-build artifact cache.
#
# Coarse quantizers, PQ/OPQ codebooks and the stored-codes index are BUILD
# cost, not query cost: real deployments (the FAISS storage model) train and
# encode once, then answer many queries. Every trainer here is deterministic
# (fixed seeds + md5 sampling), so caching per (resolved sf_dir, fixture
# mtime) for the life of the process is semantically a no-op — a cached and
# a fresh invocation return identical artifacts — while the bench's warm
# runs and the stored≡on-the-fly equivalence tests stop re-paying training.
#
# The stored index lives in a PER-PROCESS tempdir (not the shared warehouse
# dir), so concurrent invocations or parallel test workers pointed at
# different fixtures can never read each other's index; atexit removes it.
# ---------------------------------------------------------------------------
_ARTIFACT_CACHE: dict[tuple, object] = {}


def _fixture_key(sf_dir: str) -> tuple[str, int]:
    import os

    real = os.path.realpath(sf_dir)
    emb = os.path.join(real, "embeddings.parquet")
    try:
        mtime = os.stat(emb).st_mtime_ns
    except OSError:
        mtime = -1
    return (real, mtime)


def _cached_artifact(sf_dir: str, name: str, build):
    key = (*_fixture_key(sf_dir), name)
    if key not in _ARTIFACT_CACHE:
        _ARTIFACT_CACHE[key] = build()
    return _ARTIFACT_CACHE[key]


def _fresh_index_dir(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _residuals(emb: DataFrame, coarse) -> DataFrame:
    """(vec_id, cluster, full=vec - coarse[cluster]) — all JVM-side."""
    from go_batch_processor_spark.operators.ml import assign_clusters

    assigned = assign_clusters(emb, coarse).select("vec_id", "vec", "cluster")
    cent_lits = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in coarse]
    )
    residual = F.zip_with(
        F.col("vec"),
        F.element_at(cent_lits, F.col("cluster") + 1),
        lambda a, b: a - b,
    )
    return assigned.select("vec_id", "cluster", residual.alias("full"))


def _train_sample(res: DataFrame) -> DataFrame:
    """Deterministic 25% md5 training sample (FAISS practice: train on a
    sample, encode the full corpus)."""
    return res.filter(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    )


def _ivfpq_train(spark: SparkSession, sf_dir: str):
    """Cached (coarse centroids, residual PQ codebooks) shared by the
    plain IVF-PQ family — identical seeds/sample to the historical inline
    training, so stored and on-the-fly variants stay row-identical."""
    from go_batch_processor_spark.operators.ml import _as_double, kmeans_lloyd

    def build():
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double(F.col("embedding")).alias("vec")
        )
        _, coarse = kmeans_lloyd(emb, k=IVF_CELLS, iters=2)
        res = _residuals(emb, coarse)
        books = _pq_train(_train_sample(res), PQ_SUBSPACES, PQ_CODEBOOK_K, PQ_ITERS)
        return coarse, books

    return _cached_artifact(sf_dir, "ivfpq_train", build)


@register("similarity_ivfpq_topk", tags={"rows_only"})
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ ANN search (the billion-vector index shape:
    FAISS IndexIVFPQ): a k-means coarse quantizer routes each vector to a
    cell; PQ codebooks trained on RESIDUALS (x - coarse centroid) encode
    each vector in M bytes; a query probes only the nprobe nearest cells
    and scores candidates with asymmetric distance computation (ADC) —
    the probe stays full-precision, candidates are scored from their
    codes via an M x K lookup table.

    Composition of existing pieces: ml.kmeans_lloyd (coarse quantizer,
    Arrow sufficient-stats iterations), the per-cell residual is computed
    JVM-side (element_at over centroid literals + zip_with subtraction,
    zero Python in that stage), _pq_train (joint residual codebooks on a
    25% sample), and one final Arrow pass over the probed cells that
    encodes candidates and folds the ADC table — the corpus never
    shuffles; the only wide op is the coarse training itself.

    Rows-only; tests/test_quantize.py asserts recall@10 against exact
    brute force and full determinism."""
    from go_batch_processor_spark.operators.ml import _as_double

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    # 1-3. coarse quantizer + residual PQ codebooks (cached build artifact)
    coarse, books = _ivfpq_train(spark, sf_dir)
    res = _residuals(emb, coarse)
    # 4. query: nearest nprobe cells to the probe, ADC over their rows
    import numpy as np

    probe = np.asarray(
        emb.filter(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["vec"],
        dtype=np.float64,
    )
    C = np.asarray(coarse, dtype=np.float64)
    cells = np.argsort(((C - probe) ** 2).sum(axis=1))[:IVFPQ_NPROBE]
    B = np.asarray(books, dtype=np.float64)  # (m, k, sub)
    m, k, sub = B.shape

    def adc(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            R = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
            ).reshape(len(pdf), m, sub)
            cl = pdf["cluster"].to_numpy()
            score = np.zeros(len(pdf))
            for j in range(m):
                # encode candidates: nearest codebook entry per subspace
                codes = (
                    ((R[:, j, None, :] - B[j][None, :, :]) ** 2)
                    .sum(axis=2)
                    .argmin(axis=1)
                )
                # ADC table for this subspace, one row per probed cell:
                # probe residual vs every codebook entry
                for cell in np.unique(cl):
                    pr = (probe - C[cell])[j * sub : (j + 1) * sub]
                    table = ((pr[None, :] - B[j]) ** 2).sum(axis=1)  # (k,)
                    mask = cl == cell
                    score[mask] += table[codes[mask]]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "adc_dist2": score}
            )

    cand = res.filter(
        F.col("cluster").isin(*[int(c) for c in cells])
        & (F.col("vec_id") != PROBE_VEC_ID)
    )
    scored = cand.select("vec_id", "cluster", "full").mapInPandas(
        adc, "vec_id long, adc_dist2 double"
    )
    return (
        scored.orderBy(F.col("adc_dist2").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select("vec_id", F.round("adc_dist2", 6).alias("adc_dist2"))
    )


@register("similarity_ivfpq_stored", tags={"rows_only"})
def similarity_ivfpq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with a STORED-codes index (the missing half of
    similarity_ivfpq_topk, which re-encodes candidates per query): encode
    every vector's residual ONCE into M one-byte codes, persist the codes
    as a parquet index PARTITIONED BY coarse cell, and answer queries with

      partition-pruned scan of the nprobe cells  ->
      broadcast join of nprobe tiny (cell, flat ADC table) rows  ->
      JVM higher-order-function fold over the stored codes.

    This is the FAISS IndexIVFPQ storage model: the expensive Arrow encode
    pass runs once at build time (index construction), and the query path
    contains ZERO Python — scoring is `aggregate(sequence(0, M-1), ...)`
    over `element_at(adc, j*K + code_j + 1)`, whole-stage-codegen'd. At
    100 TB the index write shuffles once (by cell) and every probe after
    that reads only nprobe/IVF_CELLS of the data via partition pruning.

    Same coarse quantizer, residual codebooks, sample, and seeds as
    similarity_ivfpq_topk, so the two return IDENTICAL results —
    tests/test_quantize.py asserts that equivalence plus recall@10.

    Rows-only (hash/kmeans specific; no SQL oracle).
    """
    from go_batch_processor_spark.operators.ml import _as_double

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )

    # ---- build (cached): train, encode once, store codes partitioned by
    # coarse cell in a per-process tempdir (no shared-path races, atexit
    # cleanup) ----
    def build_index():
        coarse, books = _ivfpq_train(spark, sf_dir)
        res = _residuals(emb, coarse)
        B = np.asarray(books, dtype=np.float64)  # (m, k, sub)
        m, _, sub = B.shape

        def encode(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                R = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                ).reshape(len(pdf), m, sub)
                codes = np.empty((len(pdf), m), dtype=np.int32)
                for j in range(m):
                    codes[:, j] = (
                        ((R[:, j, None, :] - B[j][None, :, :]) ** 2)
                        .sum(axis=2)
                        .argmin(axis=1)
                    )
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": pdf["cluster"],
                        "codes": list(codes),
                    }
                )

        path = _fresh_index_dir("gbp_ivfpq_index_")
        (
            res.select("vec_id", "cluster", "full")
            .mapInPandas(encode, "vec_id long, cluster int, codes array<int>")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(path)
        )
        return coarse, books, path

    coarse, books, index_path = _cached_artifact(
        sf_dir, "ivfpq_stored_index", build_index
    )
    B = np.asarray(books, dtype=np.float64)
    m, k, sub = B.shape

    # ---- query: pruned scan + broadcast ADC tables + JVM fold ----
    probe = np.asarray(
        emb.filter(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["vec"],
        dtype=np.float64,
    )
    C = np.asarray(coarse, dtype=np.float64)
    cells = np.argsort(((C - probe) ** 2).sum(axis=1))[:IVFPQ_NPROBE]
    tables = []
    for cell in cells:
        pr = probe - C[cell]
        flat: list[float] = []
        for j in range(m):
            prj = pr[j * sub : (j + 1) * sub]
            flat.extend((((prj[None, :] - B[j]) ** 2).sum(axis=1)).tolist())
        tables.append((int(cell), flat))
    tbl = spark.createDataFrame(tables, "cluster int, adc array<double>")

    idx = spark.read.parquet(index_path).filter(
        F.col("cluster").isin(*[int(c) for c in cells])
        & (F.col("vec_id") != PROBE_VEC_ID)
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("adc"), j * F.lit(k) + F.element_at(F.col("codes"), j + 1) + 1
        ),
    )
    scored = idx.join(F.broadcast(tbl), "cluster").select(
        "vec_id", score.alias("adc_dist2")
    )
    return (
        scored.orderBy(F.col("adc_dist2").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select("vec_id", F.round("adc_dist2", 6).alias("adc_dist2"))
    )


OPQ_ITERS = 3


@register("similarity_opq_codebook", tags={"rows_only"})
def similarity_opq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimized Product Quantization (Ge et al., CVPR 2013): learn an
    ORTHOGONAL ROTATION R jointly with the PQ codebooks by alternating

      (1) train per-subspace codebooks on the rotated sample X@R
          (the existing joint _pq_train — one Arrow pass per Lloyd iter);
      (2) re-solve R = argmin ||X@R - X_hat||_F over orthogonal matrices,
          i.e. the Procrustes solution U@Vt from SVD(X^T @ X_hat), where
          X_hat is the PQ reconstruction in rotated space.

    Step (2) needs only the d x d cross matrix — each partition reduces
    its rows to one d*d partial (plus an error/count accumulator), so the
    shuffle per OPQ iteration is O(partitions * d^2) regardless of corpus
    size, and the SVD is a driver-side 64x64. Measured on the fixture:
    OPQ cuts PQ reconstruction MSE by ~15-19% at the same byte budget.

    Rotation/codebooks train on the deterministic 25% md5 sample (FAISS
    practice); the reported MSEs are over the FULL table. Rows-only
    (iterative, hash-sampled); tests assert mse_opq < mse_pq and
    determinism.
    """
    from go_batch_processor_spark.operators.ml import _as_double

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("full")
    )
    d, m, k = EMB_DIM, PQ_SUBSPACES, PQ_CODEBOOK_K
    sub = d // m

    def _rotator(Rb):
        def rot(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                )
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "full": list(X @ Rb)}
                )

        return rot

    def _encode_reconstruct(Y, B):
        Yh = np.empty_like(Y)
        for j in range(m):
            Z = Y[:, j * sub : (j + 1) * sub]
            codes = ((Z[:, None, :] - B[j][None, :, :]) ** 2).sum(2).argmin(1)
            Yh[:, j * sub : (j + 1) * sub] = B[j][codes]
        return Yh

    def train_opq():
        train = emb.filter(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        ).persist()
        R = np.eye(d)
        books0 = None  # iteration-0 books == plain PQ (R = identity)
        books = None
        try:
            for it_n in range(OPQ_ITERS):
                Rb = R.copy()
                rotated = train.mapInPandas(
                    _rotator(Rb), "vec_id long, full array<double>"
                )
                books = _pq_train(rotated, m, k, PQ_ITERS)
                if it_n == 0:
                    books0 = books
                B = np.asarray(books, dtype=np.float64)

                def cross(it, Rb=Rb, B=B):
                    import numpy as np
                    import pandas as pd

                    G = np.zeros((d, d))
                    err = 0.0
                    n = 0
                    for pdf in it:
                        if not len(pdf):
                            continue
                        X = np.array(
                            [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                        )
                        Y = X @ Rb
                        Yh = _encode_reconstruct(Y, B)
                        G += X.T @ Yh
                        err += ((Y - Yh) ** 2).sum()
                        n += len(X)
                    out = np.concatenate([G.ravel(), [err, float(n)]])
                    yield pd.DataFrame(
                        {"pos": np.arange(d * d + 2), "v": out}
                    )

                rows = (
                    train.select("full")
                    .mapInPandas(cross, "pos long, v double")
                    .groupBy("pos")
                    .agg(F.sum("v").alias("v"))
                    .collect()
                )
                acc = np.zeros(d * d + 2)
                for r in rows:
                    acc[r["pos"]] = r["v"]
                U, _, Vt = np.linalg.svd(acc[: d * d].reshape(d, d))
                R = U @ Vt
            # final codebooks on the final rotation; error over the FULL
            # table is scored per-invocation below
            books = _pq_train(
                train.mapInPandas(
                    _rotator(R.copy()), "vec_id long, full array<double>"
                ),
                m,
                k,
                PQ_ITERS,
            )
        finally:
            train.unpersist(blocking=False)
        return R, books, books0

    R, books, books0 = _cached_artifact(sf_dir, "opq_codebook", train_opq)
    B = np.asarray(books, dtype=np.float64)
    B0 = np.asarray(books0, dtype=np.float64)

    # ONE full-table pass scores both models (plain PQ with R = identity
    # vs OPQ with the learned rotation) so the comparison is same-population.
    def final_err(it, Rb=R.copy(), B=B, B0=B0):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
            )
            Y = X @ Rb
            yield pd.DataFrame(
                {
                    "err_opq": ((Y - _encode_reconstruct(Y, B)) ** 2).sum(axis=1),
                    "err_pq": ((X - _encode_reconstruct(X, B0)) ** 2).sum(axis=1),
                }
            )

    errs = emb.select("full").mapInPandas(
        final_err, "err_opq double, err_pq double"
    )
    return errs.agg(
        F.lit(m).alias("m_subspaces"),
        F.lit(k).alias("k_per_subspace"),
        F.lit(OPQ_ITERS).alias("opq_iters"),
        F.round(F.avg(F.col("err_pq") / d), 6).alias("mse_pq"),
        F.round(F.avg(F.col("err_opq") / d), 6).alias("mse_opq"),
    )


@register("similarity_ann_lsh_multiprobe", tags={"rows_only"})
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB 2007): each vector probes its own
    bucket PLUS the 8 Hamming-distance-1 neighbor buckets (one bit of the
    hyperplane signature flipped). Near-misses — true neighbors that fall
    one hyperplane to the other side — are recovered WITHOUT extra hash
    tables, the standard recall/cost lever at index scale.

    Scale shape: the x9 probe explode happens on a NARROW (vec_id, bucket)
    projection — two longs' worth per row, never the embedding array; the
    candidate pairs then join back to the embedding table twice for the
    exact cosine. Each qualifying pair matches exactly once (the 9 probe
    buckets of a vector are distinct, the other side sits in its single
    home bucket). Deterministic (seed 42); rows-only like the single-probe
    variant; the recall test asserts it strictly dominates single-probe.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    planes = _hyperplanes()
    bits = [
        F.when(
            _dot(F.col("emb"), F.array(*[F.lit(v) for v in plane])) > 0, "1"
        ).otherwise("0")
        for plane in planes
    ]
    sig = F.concat_ws("", *bits)
    # Not persisted: the returned lazy plan reads this four ways (probes,
    # home buckets, both cosine sides) and an in-function unpersist would
    # drop the blocks before the consumer runs (the minhash cache-ownership
    # rule). The signature recompute is one scan + 8 dot products; a
    # long-lived 100 TB index would persist the bucketed table under an
    # owner that outlives the query instead.
    bucketed = emb.select("vec_id", "emb", sig.alias("bucket"))
    n = len(planes)
    flip = [
        F.concat(
            F.substring(F.col("bucket"), 1, i),
            F.when(
                F.substring(F.col("bucket"), i + 1, 1) == "1", "0"
            ).otherwise("1"),
            F.substring(F.col("bucket"), i + 2, n - i - 1),
        )
        for i in range(n)
    ]
    probes = bucketed.select(
        "vec_id",
        F.explode(F.array(F.col("bucket"), *flip)).alias("probe_bucket"),
    )
    cand = (
        probes.join(
            bucketed.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("bucket").alias("probe_bucket"),
            ),
            "probe_bucket",
        )
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
    )
    a = bucketed.select(F.col("vec_id"), F.col("emb").alias("ea"))
    b = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("eb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (
        _norm(F.col("ea")) * _norm(F.col("eb"))
    )
    pairs = (
        cand.join(a, "vec_id")
        .join(b, "neighbor_id")
        .select("vec_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "neighbor_id", "cosine")
    )


IVFPQ_OPQ_ITERS = 2


@register("similarity_ivfpq_opq_topk", tags={"rows_only"})
def similarity_ivfpq_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with an OPQ-rotated residual space (the FAISS "OPQ,IVF,PQ"
    index preset): the coarse quantizer routes vectors to cells exactly as
    similarity_ivfpq_topk, but residuals are rotated by an orthogonal
    matrix learned with the similarity_opq_codebook alternation BEFORE PQ
    encoding — the rotation decorrelates the residual subspaces, cutting
    quantization distortion at identical code size, which lifts ADC
    ranking fidelity.

    Same scale shape as ivfpq: per OPQ iteration one joint PQ training
    (Arrow sufficient-stats passes) plus one d x d cross-matrix reduction;
    the rotation applies inside the same Arrow pass that encodes, so the
    query path cost is unchanged. Rows-only; recall@10 asserted >= the
    unrotated variant minus noise in tests/test_quantize.py.
    """
    from go_batch_processor_spark.operators.ml import _as_double

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    d, m, k = EMB_DIM, PQ_SUBSPACES, PQ_CODEBOOK_K
    sub = d // m

    def _rot(Rb):
        def fn(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                )
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"], "full": list(X @ Rb)}
                )

        return fn

    def train_opq_ivf():
        from go_batch_processor_spark.operators.ml import kmeans_lloyd

        _, coarse = kmeans_lloyd(emb, k=IVF_CELLS, iters=2)
        train = _train_sample(_residuals(emb, coarse)).persist()
        R = np.eye(d)
        books = None
        try:
            for _ in range(IVFPQ_OPQ_ITERS):
                Rb = R.copy()
                books = _pq_train(
                    train.mapInPandas(_rot(Rb), "vec_id long, full array<double>"),
                    m,
                    k,
                    PQ_ITERS,
                )
                B = np.asarray(books, dtype=np.float64)

                def cross(it, Rb=Rb, B=B):
                    import numpy as np
                    import pandas as pd

                    G = np.zeros((d, d))
                    for pdf in it:
                        if not len(pdf):
                            continue
                        X = np.array(
                            [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
                        )
                        Y = X @ Rb
                        Yh = np.empty_like(Y)
                        for j in range(m):
                            Z = Y[:, j * sub : (j + 1) * sub]
                            codes = (
                                ((Z[:, None, :] - B[j][None, :, :]) ** 2)
                                .sum(2)
                                .argmin(1)
                            )
                            Yh[:, j * sub : (j + 1) * sub] = B[j][codes]
                        G += X.T @ Yh
                    yield pd.DataFrame({"pos": np.arange(d * d), "v": G.ravel()})

                rows = (
                    train.select("full")
                    .mapInPandas(cross, "pos long, v double")
                    .groupBy("pos")
                    .agg(F.sum("v").alias("v"))
                    .collect()
                )
                G = np.zeros(d * d)
                for r in rows:
                    G[r["pos"]] = r["v"]
                U, _, Vt = np.linalg.svd(G.reshape(d, d))
                R = U @ Vt
            books = _pq_train(
                train.mapInPandas(_rot(R.copy()), "vec_id long, full array<double>"),
                m,
                k,
                PQ_ITERS,
            )
        finally:
            train.unpersist(blocking=False)
        return coarse, R, books

    coarse, R, books = _cached_artifact(sf_dir, "ivfpq_opq_train", train_opq_ivf)
    res = _residuals(emb, coarse)

    probe = np.asarray(
        emb.filter(F.col("vec_id") == PROBE_VEC_ID).collect()[0]["vec"],
        dtype=np.float64,
    )
    C = np.asarray(coarse, dtype=np.float64)
    cells = np.argsort(((C - probe) ** 2).sum(axis=1))[:IVFPQ_NPROBE]
    B = np.asarray(books, dtype=np.float64)

    def adc(it, Rb=R.copy(), B=B):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            Xr = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["full"]]
            ) @ Rb
            Xr = Xr.reshape(len(pdf), m, sub)
            cl = pdf["cluster"].to_numpy()
            score = np.zeros(len(pdf))
            for j in range(m):
                codes = (
                    ((Xr[:, j, None, :] - B[j][None, :, :]) ** 2)
                    .sum(axis=2)
                    .argmin(axis=1)
                )
                for cell in np.unique(cl):
                    pr = ((probe - C[cell]) @ Rb)[j * sub : (j + 1) * sub]
                    table = ((pr[None, :] - B[j]) ** 2).sum(axis=1)
                    mask = cl == cell
                    score[mask] += table[codes[mask]]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "adc_dist2": score})

    cand = res.filter(
        F.col("cluster").isin(*[int(c) for c in cells])
        & (F.col("vec_id") != PROBE_VEC_ID)
    )
    scored = cand.select("vec_id", "cluster", "full").mapInPandas(
        adc, "vec_id long, adc_dist2 double"
    )
    return (
        scored.orderBy(F.col("adc_dist2").asc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select("vec_id", F.round("adc_dist2", 6).alias("adc_dist2"))
    )


MMR_LAMBDA = 0.7
MMR_CANDIDATES = 50
MMR_K = 10


@register("similarity_mmr_diversify", tags={"rows_only"})
def similarity_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    retrieve 50 exact-cosine candidates for the probe, then greedily pick
    10 maximizing lambda*rel - (1-lambda)*max-sim-to-already-picked — the
    standard diversity pass between ANN retrieval and an LLM context
    window (near-duplicate passages waste context tokens; MMR suppresses
    them at selection time).

    Scale shape: stage 1 is the distributed part (one corpus scan,
    broadcast probe, TakeOrderedAndProject top-50 — identical plan to
    similarity_topk_cosine, any retrieval op can feed it); stage 2 is
    greedy over k x candidates pairs, inherently sequential and O(50*10)
    — DRIVER-side by design on a bounded candidate set (collect of 50
    rows), exactly where FAISS/vector-DB rerankers run it. Rows-only:
    the greedy argmax has no SQL twin; tests/test_ml.py pins it against
    a numpy reference.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID)
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    p = probe.select(
        F.col("vec_id").alias("probe_id"),
        _as_double(F.col("embedding")).alias("pemb"),
    )
    rel = _dot(F.col("emb"), F.col("pemb")) / (
        _norm(F.col("emb")) * _norm(F.col("pemb"))
    )
    cands = (
        e.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("vec_id", rel.alias("rel"), "emb")
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(MMR_CANDIDATES)
        .collect()  # bounded: MMR_CANDIDATES rows (id, rel, 64 doubles)
    )
    ids = [r.vec_id for r in cands]
    rels = np.array([r.rel for r in cands])
    vecs = np.array([r.emb for r in cands])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vecs @ vecs.T  # candidate-candidate cosine, 50x50
    picked: list[int] = []
    remaining = list(range(len(ids)))
    while remaining and len(picked) < MMR_K:
        if picked:
            penalty = sims[np.ix_(remaining, picked)].max(axis=1)
        else:
            penalty = np.zeros(len(remaining))
        scores = MMR_LAMBDA * rels[remaining] - (1 - MMR_LAMBDA) * penalty
        # deterministic argmax: highest score, then lowest vec_id
        best = min(
            range(len(remaining)), key=lambda j: (-scores[j], ids[remaining[j]])
        )
        picked.append(remaining.pop(best))
    out = [
        (int(ids[i]), float(round(rels[i], 6)), rank + 1)
        for rank, i in enumerate(picked)
    ]
    return spark.createDataFrame(
        out, "vec_id bigint, relevance double, mmr_rank int"
    )


KNN_GRAPH_K = 5


@register(
    "similarity_knn_graph",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.v * b.v) AS dot
      FROM flat a
      JOIN flat b ON a.i = b.i AND a.label = b.label AND a.vec_id <> b.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT src, dst, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      FROM dots
      JOIN norms na ON src = na.vec_id
      JOIN norms nb ON dst = nb.vec_id
    )
    SELECT src, dst, cosine, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT src, dst, cosine,
             row_number() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst ASC) AS rn
      FROM scored
    )
    WHERE rn <= {KNN_GRAPH_K}
    """,
)
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction (k=5 cosine neighbors per vector, within
    label blocks) — the substrate for graph-based ANN (HNSW/NSG build),
    label propagation over embeddings, and connectivity-based near-dup
    clustering. Fully oracled.

    Ranking runs on the 6-dp-ROUNDED cosine with a dst tiebreak on both
    engines, so float-noise at the k-th boundary can never diverge the
    edge set. Blocking (label here; an LSH bucket or IVF cell in
    production) bounds the candidate join exactly as in
    dedup_embedding_cosine — the all-pairs explosion happens within
    blocks only, and the per-src top-k window shuffles once on src. The
    unblocked 100 TB path swaps the block join for
    similarity_ann_lsh-style candidate generation; the ranking half is
    unchanged.
    """
    # Norms precomputed once per vector (r9 — the knn_classifier lesson:
    # inlining _norm evaluated two extra 64-element folds per PAIR).
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", _as_double(F.col("embedding")).alias("emb"))
        .withColumn("nrm", _norm(F.col("emb")))
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    scored = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        F.round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_GRAPH_K)
        .select("src", "dst", "cosine", F.col("rn").cast("long"))
    )


RP_OUT_DIM = 16
RP_SEED = 42


@register("similarity_random_projection", tags={"rows_only"})
def similarity_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the embedding corpus
    (d=64 -> m=16) with a deterministic Rademacher (±1/√m) matrix
    (Achlioptas 2003 — database-friendly projections: no Gaussians
    needed, same JL guarantee). The 4x-smaller vectors preserve
    pairwise distances within 1±ε in expectation — the cheap first
    stage before ANN indexing or clustering at 100 TB.

    Plan: the projection is a dense 64×16 matmul per row — exactly the
    regime where an Arrow kernel beats codegen (1024-term HOF
    expressions spend >10 s compiling — measured, HANDOFF lesson 10):
    one mapInPandas pass, matrix built once per task from a fixed seed,
    NO shuffle at all (embarrassingly parallel). Emits per-vector
    original/projected norms (hash-stable scalars, not arrays — parity
    rules); tests/test_quantize.py pins exact agreement with a numpy
    twin and the JL norm-concentration bound corpus-wide."""
    import numpy as np
    import pandas as pd

    out_dim, seed = RP_OUT_DIM, RP_SEED

    def kernel(batches):
        R = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if R is None:
                rng = np.random.default_rng(seed)
                R = rng.choice([-1.0, 1.0], size=(X.shape[1], out_dim)) / np.sqrt(
                    out_dim
                )
            P = X @ R
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "proj_norm": np.round(np.linalg.norm(P, axis=1), 6),
                    "orig_norm": np.round(np.linalg.norm(X, axis=1), 6),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, proj_norm double, orig_norm double"
    )


@register(
    "similarity_ndcg_eval",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    probe AS (SELECT i, v FROM flat WHERE vec_id = {PROBE_VEC_ID}),
    dots AS (
      SELECT f.vec_id, sum(f.v * p.v) AS dot, sqrt(sum(f.v * f.v)) AS nrm
      FROM flat f JOIN probe p ON f.i = p.i
      GROUP BY f.vec_id
    ),
    pn AS (SELECT sqrt(sum(v * v)) AS nrm FROM probe),
    top AS (
      SELECT d.vec_id, round(d.dot / (d.nrm * pn.nrm), 6) AS cosine
      FROM dots d, pn
      WHERE d.vec_id <> {PROBE_VEC_ID}
      ORDER BY cosine DESC, d.vec_id ASC
      LIMIT {TOP_K}
    ),
    plab AS (SELECT label FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
    ranked AS (
      SELECT CASE WHEN e.label = plab.label THEN 1 ELSE 0 END AS rel,
             row_number() OVER (ORDER BY t.cosine DESC, t.vec_id) AS k
      FROM top t JOIN embeddings e USING (vec_id) CROSS JOIN plab
    ),
    nrel AS (
      SELECT count(*) AS nr FROM embeddings e, plab
      WHERE e.label = plab.label AND e.vec_id <> {PROBE_VEC_ID}
    ),
    dcg AS (SELECT sum(rel / log2(k + 1.0)) AS dcg FROM ranked),
    idcg AS (
      SELECT sum(1.0 / log2(CAST(i AS DOUBLE) + 1.0)) AS idcg
      FROM nrel,
           unnest(generate_series(1, CASE WHEN nr < {TOP_K} THEN nr
                                          ELSE {TOP_K} END)) AS t(i)
    )
    SELECT round(dcg.dcg, 6)             AS dcg_at_10,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg_at_10,
           (SELECT CAST(nr AS BIGINT) FROM nrel) AS n_relevant
    FROM dcg, idcg
    """,
)
def similarity_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the brute-force cosine retriever against label-match
    relevance (probe vec 0's label) — the ranking-quality eval every
    retrieval/RAG pipeline reports: DCG = Σ rel_k/log₂(k+1) over the
    retrieved list, normalized by the ideal DCG given how many relevant
    items exist corpus-wide.

    Plan: the ranked list is the existing one-scan cosine top-k
    (TakeOrderedAndProject on the rounded score — rounding BEFORE
    ordering keeps the k-boundary engine-stable); relevance joins the
    vocabulary-sized label table broadcast; DCG/IDCG run on ≤10 rows
    (IDCG's harmonic series materializes via sequence-explode of a
    1-row frame — no table needed). Eval cost is dominated by the
    retrieval itself, as it should be."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID)
    top = cosine_topk(emb, probe, TOP_K)
    plab = probe.select(F.col("label").alias("plabel"))
    ranked = (
        top.join(F.broadcast(emb.select("vec_id", "label")), "vec_id")
        .crossJoin(F.broadcast(plab))
        .select(
            F.when(F.col("label") == F.col("plabel"), 1).otherwise(0).alias("rel"),
            F.row_number()
            .over(Window.partitionBy().orderBy(F.col("cosine").desc(), "vec_id"))
            .alias("k"),
        )
    )
    nrel = (
        emb.crossJoin(F.broadcast(plab))
        .filter((F.col("label") == F.col("plabel")) & (F.col("vec_id") != PROBE_VEC_ID))
        .agg(F.count(F.lit(1)).alias("nr"))
    )
    dcg = ranked.agg(
        F.sum(F.col("rel") / F.log2(F.col("k") + 1.0)).alias("dcg")
    )
    # nr = 0 guard (ADVICE r5): Spark's sequence(1, 0) is a DESCENDING
    # [1, 0] (the i=0 term divides by log2(1) = 0) while DuckDB's
    # generate_series(1, 0) is empty. Emit an empty array when nr < 1 so
    # both engines agree: 0-row aggregate → NULL idcg → NULL ndcg.
    # n_relevant comes from nrel directly so it stays 0 (not NULL).
    idcg = nrel.select(
        F.explode(
            F.when(
                F.col("nr") >= 1,
                F.sequence(F.lit(1), F.least(F.col("nr"), F.lit(TOP_K))),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i")
    ).agg(F.sum(1.0 / F.log2(F.col("i").cast("double") + 1.0)).alias("idcg"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(nrel))
        .select(
            F.round("dcg", 6).alias("dcg_at_10"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
            F.col("nr").cast("bigint").alias("n_relevant"),
        )
    )


KNN_CLF_K = 5


@register(
    "similarity_knn_classifier",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.v * b.v) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT d.src, e.label AS nb_label,
             row_number() OVER (PARTITION BY d.src
               ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC, d.dst) AS rn
      FROM dots d
      JOIN norms na ON d.src = na.vec_id
      JOIN norms nb ON d.dst = nb.vec_id
      JOIN embeddings e ON d.dst = e.vec_id
    ),
    votes AS (
      SELECT src, nb_label, count(*) AS c FROM ranked
      WHERE rn <= {KNN_CLF_K} GROUP BY 1, 2
    ),
    pred AS (
      SELECT src, nb_label AS pred_label FROM (
        SELECT src, nb_label,
               row_number() OVER (PARTITION BY src
                 ORDER BY c DESC, nb_label ASC) AS pr
        FROM votes
      ) WHERE pr = 1
    )
    SELECT e.label,
           CAST(count(*) AS BIGINT)                            AS n,
           CAST(sum(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_correct,
           round(sum(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4)                          AS accuracy
    FROM pred p JOIN embeddings e ON p.src = e.vec_id
    GROUP BY e.label
    """,
)
def similarity_knn_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN classification (k=5, cosine, majority vote
    with deterministic count-then-smallest-label tie-break) reported as
    per-label accuracy — the embedding-quality probe: if 5-NN can't
    recover the label, the embedding space won't support downstream
    clustering or retrieval either (the standard probe before spending
    GPU time on a learned classifier).

    UNBLOCKED neighbor search (unlike similarity_knn_graph's
    label-blocked build, which would be circular as a classifier).
    Ranking on the 6-dp-ROUNDED cosine with dst tie-break → the k-th
    boundary is engine-stable. Scale: the all-pairs stage is the cost —
    swap in the IVF/LSH candidate generators for the neighbor leg at
    corpus scale; votes/argmax/accuracy are vocabulary-sized
    aggregates."""
    # Norms are precomputed ONCE per vector (r9 — found by the sf0.1
    # non-headline sweep): inlining _norm into the pair expression
    # re-evaluated two 64-element folds per PAIR (3 folds/pair incl. the
    # dot), and the nested-loop join ran at the scan's 1-2-task
    # parallelism — 76 s at sf0.1. Precomputing norms (identical fold,
    # identical value) and spreading the probe side cuts it to ~2 s with
    # a bit-identical result.
    from go_batch_processor_spark.spread import _spread

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("emb")
    )
    e = e.withColumn("nrm", _norm(F.col("emb")))
    a, b = _spread(e).alias("a"), e.alias("b")
    # r14: an unrolled-SQL twin of this dot was tried and REVERTED —
    # measured 4.0x slower than the HOF fold (negative-result note at
    # the _dot definition above).
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    ranked = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("a.label").alias("true_label"),
            F.col("b.label").alias("nb_label"),
            F.round(cos, 6).alias("cosine"),
            F.col("b.vec_id").alias("dst"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(
                    F.col("cosine").desc(), F.col("dst").asc()
                )
            ),
        )
        .filter(F.col("rn") <= KNN_CLF_K)
    )
    votes = ranked.groupBy("src", "true_label", "nb_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    pred = (
        votes.withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("src").orderBy(
                    F.col("c").desc(), F.col("nb_label").asc()
                )
            ),
        )
        .filter(F.col("pr") == 1)
        .select("src", "true_label", F.col("nb_label").alias("pred_label"))
    )
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("accuracy"),
    )


@register(
    "similarity_embedding_drift",
    oracle="""
    WITH flat AS (
      SELECT vec_id, label, vec_id % 2 AS half,
             CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    mu AS (
      SELECT label, half, i, avg(v) AS m, count(*) AS n
      FROM flat GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.label, a.i, a.m AS ma, b.m AS mb, a.n AS na, b.n AS nb
      FROM mu a JOIN mu b ON a.label = b.label AND a.i = b.i
      WHERE a.half = 0 AND b.half = 1
    )
    SELECT label,
           round(sum(ma * mb)
                 / (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 4)
             AS centroid_cosine,
           round(sqrt(sum((ma - mb) * (ma - mb))), 4) AS centroid_l2_shift,
           CAST(any_value(na) AS BIGINT) AS n_a,
           CAST(any_value(nb) AS BIGINT) AS n_b
    FROM pairs GROUP BY label
    """,
)
def similarity_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per-label centroid cosine and L2
    shift between two corpus snapshots (halves by vec_id parity here;
    yesterday-vs-today partitions in production) — the cheap alarm that
    catches a re-trained or corrupted encoder BEFORE the downstream ANN
    index silently degrades (centroid_cosine ≈ 1 is healthy; a label
    whose centroid rotated is the drill-down target).

    Plan: ONE posexplode scan -> per-(label, half, dim) mean (partial-
    combinable, output is |labels|·2·d rows — tiny), then the drift
    metrics are a d-term aggregate per label on that frame. No
    corpus-sized shuffle; 100 TB cost is the scan. Means are
    accumulation-order sensitive in the last ulp -> metrics rounded to
    4 on both sides (the cosine of means is stable far beyond that)."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(_as_double(F.col("embedding"))).alias("i", "v"),
    )
    mu = flat.groupBy("label", "half", "i").agg(
        F.avg("v").alias("m"), (F.count(F.lit(1))).alias("n")
    )
    a = mu.filter(F.col("half") == 0).select(
        "label", "i", F.col("m").alias("ma"), F.col("n").alias("na")
    )
    b = mu.filter(F.col("half") == 1).select(
        "label", "i", F.col("m").alias("mb"), F.col("n").alias("nb")
    )
    return (
        a.join(b, ["label", "i"])
        .groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("ma") * F.col("mb"))
                / (
                    F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                    * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
                ),
                4,
            ).alias("centroid_cosine"),
            F.round(
                F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))),
                4,
            ).alias("centroid_l2_shift"),
            F.first("na").cast("bigint").alias("n_a"),
            F.first("nb").cast("bigint").alias("n_b"),
        )
    )


@register(
    "similarity_silhouette_simplified",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    cflat AS (SELECT vec_id AS cid, v, i FROM flat WHERE vec_id < {ASSIGN_K}),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM flat GROUP BY vec_id),
    dots AS (
      SELECT f.vec_id, c.cid, sum(f.v * c.v) AS dot
      FROM flat f JOIN cflat c ON f.i = c.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.vec_id, d.cid, d.dot / (n1.nrm * n2.nrm) AS cos
      FROM dots d
      JOIN norms n1 ON d.vec_id = n1.vec_id
      JOIN norms n2 ON d.cid = n2.vec_id
    ),
    r AS (
      SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS rn
      FROM scored
    ),
    top2 AS (
      SELECT vec_id,
             max(CASE WHEN rn = 1 THEN cid END) AS centroid_id,
             max(CASE WHEN rn = 1 THEN cos END) AS c1,
             max(CASE WHEN rn = 2 THEN cos END) AS c2
      FROM r WHERE rn <= 2 GROUP BY vec_id
    )
    SELECT centroid_id,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg((c1 - c2) / greatest(1 - c1, 1 - c2)), 6)
             AS mean_silhouette
    FROM top2
    GROUP BY centroid_id
    ORDER BY centroid_id
    """,
)
def similarity_silhouette_simplified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the
    clustering-quality readout for the fixed-centroid assignment
    (similarity_centroid_assign's building block): with cosine
    DISTANCE d = 1 - cos, a = distance to the OWN (nearest) centroid,
    b = to the runner-up, s = (b - a)/max(a, b) = (c1 - c2) /
    max(1-c1, 1-c2) in similarity terms (Hruschka et al.'s simplified
    silhouette — O(N*K) where the exact silhouette's pairwise form is
    O(N^2), the only version that scales).

    Plan shape: same single broadcast-centroids scan as centroid
    assignment; the per-vector top-2 collapses via ONE map-side
    partial-combinable aggregate (array_sort over the K-element struct
    list, K=16 — not a rank window, which would shuffle all K*N scored
    rows), then a K-row cluster aggregate. Dot products fold dims in
    index order on both engines; ties break (cos DESC, cid ASC)
    identically.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    cents = e.filter(F.col("vec_id") < ASSIGN_K).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    cos = _dot(F.col("emb"), F.col("cemb")) / (
        _norm(F.col("emb")) * _norm(F.col("cemb"))
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cos.alias("cos")
    )
    # ascending sort of (-cos, cid) structs == (cos DESC, cid ASC)
    arr = F.array_sort(
        F.collect_list(
            F.struct((-F.col("cos")).alias("nc"), F.col("cid").alias("cid"))
        )
    )
    top2 = scored.groupBy("vec_id").agg(
        F.element_at(arr, 1).alias("b1"), F.element_at(arr, 2).alias("b2")
    )
    c1 = -F.col("b1.nc")
    c2 = -F.col("b2.nc")
    s = (c1 - c2) / F.greatest(1 - c1, 1 - c2)
    return (
        top2.select(F.col("b1.cid").alias("centroid_id"), s.alias("s"))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
        .orderBy("centroid_id")
    )
