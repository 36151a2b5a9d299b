"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md §2.2 registers here as a named QuerySpec:
a Spark query callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string computing the
same result with identical column names and rounding. ``__spark_entry__.py``
re-exports this registry verbatim.

Parity rules (SURVEY.md §7.5 "oracle parity traps"):
  - alias every computed column identically on both sides;
  - per-row IEEE double arithmetic is bit-exact across engines — leave raw;
  - order-dependent double aggregates (sum/avg over shuffled data) are NOT
    bit-exact — round to a fixed scale on BOTH sides;
  - never round stored 2-decimal prices at <=2 decimals (values sit exactly
    on half-way points where engines' rounding of the underlying binary
    double diverges); only round genuinely continuous computed values;
  - cast width-divergent results (DuckDB length()->BIGINT vs Spark ->INT,
    DuckDB sum(int)->HUGEINT) to an explicit common type on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    tags: frozenset[str] = field(default_factory=frozenset)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Session confs every query depends on for correctness, enforced at call
# time because the driver hands queries ITS OWN SparkSession (not our
# session.get_spark one): timestamps must be UTC to hash-match DuckDB's
# naive timestamps, and events.parquet's TIMESTAMP(NANOS) column needs the
# nanos-as-long read path. All are runtime-settable session confs.
REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Streaming queries in the registry should run on the production
    # (RocksDB, off-heap + disk-spill) state store regardless of whose
    # session executes them.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover — conf missing in this build
            spark.conf.set(k, v)


def register(
    name: str, oracle: str | None = None, tags: frozenset[str] | set[str] = frozenset()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL.

    The registered callable pins REQUIRED_CONFS on the passed session
    before building the plan."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            tags=frozenset(tags),
            doc=fn.__doc__ or "",
        )
        return fn

    return deco


def _driver_check_counts() -> dict[str, int]:
    """How many times each query key has appeared in a driver
    CORRECTNESS_r*.json verdict (any round, any outcome).

    The driver samples only the FIRST 50 entries of ``queries()`` each
    round, so insertion order decides which operators ever get the hard
    external correctness signal. Counting past verdicts lets
    ``driver_sample_order`` rotate never-checked keys to the front
    automatically every round with no manual reordering.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):  # pragma: no cover — malformed round file
            continue
        if isinstance(data, dict):
            for key in data:
                counts[key] = counts.get(key, 0) + 1
    return counts


def driver_sample_order(names: list[str]) -> list[str]:
    """Order query keys least-driver-checked first; among NEVER-checked
    keys tiebreak by FORWARD insertion order, among checked keys by
    reverse.

    Rationale (r4): the r3 sample consumed the late-module never-checked
    families (the r3 reverse tiebreak's purpose), so the never-checked
    tail is now dominated by EARLY-module keys that have waited since r2/r3
    (tpch shapes, analytics, mv_incremental_agg — the keys the r3 verdict
    names explicitly) plus brand-new late-module r4 keys that already have
    fresh local sf0.01 value parity. Forward order sends the longest-
    waiting keys into this round's 50-entry sample and lets the new ones
    take the next round — the rotation still self-corrects: whatever
    misses a sample has a strictly lower check count next round.
    Deterministic for a given set of round files.
    """
    counts = _driver_check_counts()
    idx = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            counts.get(n, 0),
            (n in _NEW_IN_R4, idx[n]) if counts.get(n, 0) == 0 else (False, -idx[n]),
        ),
    )


# Keys first registered in round 4 — every key the r3 verdict's rotation
# list names predates these, so they wait one round (each has fresh local
# sf0.01 value parity from this round). INERT once each has a driver
# CORRECTNESS row (counts > 0); safe to delete then.
_NEW_IN_R4 = frozenset(
    {
        "tpch_q20_shape",
        "similarity_ivfpq_stored",
        "similarity_opq_codebook",
        "similarity_ivfpq_opq_topk",
        "similarity_ann_lsh_multiprobe",
        "join_asof_nearest",
        "stream_static_join",
        "stream_stream_interval_join",
        "text_bpe_pair_counts",
        "text_bpe_train_merges",
        "graph_triangle_count",
        "window_percent_cume",
        "agg_mode_deterministic",
        "timeseries_interpolate_linear",
        "timeseries_ewma",
        "cdc_scd2_history",
        "analytics_rfm_segmentation",
        "join_scd2_lookup",
        "agg_regression_stats",
        "ml_ols_normal_equations",
        "stats_ks_two_sample",
    }
)


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    order = driver_sample_order(list(REGISTRY))
    return {name: REGISTRY[name].fn for name in order}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    order = driver_sample_order(list(REGISTRY))
    return {n: REGISTRY[n].oracle for n in order if REGISTRY[n].oracle is not None}


def _ensure_loaded() -> None:
    # Import operator modules for their registration side effects.
    import go_batch_processor_spark.operators  # noqa: F401

    _register_pickle_by_value()


def _register_pickle_by_value() -> None:
    """Serialize worker-crossing engine callables BY VALUE.

    cloudpickle pickles module-level functions/classes by reference, which
    makes Python workers try to import this package — and the driver
    process (not ours) controls whether the repo dir is on the workers'
    PYTHONPATH. By-value registration makes UDFs / mapInPandas kernels /
    the custom DataSource self-contained regardless of worker environment.
    """
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover
        return
    import go_batch_processor_spark.operators.ml as _ml
    import go_batch_processor_spark.operators.multimodal as _mm
    import go_batch_processor_spark.operators.timeseries as _ts
    import go_batch_processor_spark.operators.udfs as _udfs
    import go_batch_processor_spark.sources.supplier_source as _src
    import go_batch_processor_spark.streaming.stateful as _stateful

    import go_batch_processor_spark.operators.similarity as _sim

    for mod in (_ml, _mm, _ts, _udfs, _src, _stateful, _sim):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # pragma: no cover — older cloudpickle
            pass
