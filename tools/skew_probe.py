#!/usr/bin/env python
"""Hot-user skew probe (VERDICT r12 item 2's measurement half).

Builds two equal-size events frames in /tmp — UNIFORM (rows spread over
~50k users) and SKEWED (one user owns 30%) — and times the per-user
window-family keys on both at local[32]. The skew/uniform wall-time
ratio is the straggler cost of a user-history-sized WindowExec frame;
the streaming funnel (O(1) state per user) is timed on the same skewed
input as the documented mitigation. Also records the max-task share via
the status tracker where available.

Numbers land in SCALE.md's hot-key section. The correctness half
(oracle parity under skew + streaming==batch equality) lives in
tests/test_hot_user_skew.py.

Usage: python tools/skew_probe.py [--rows 2000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

KEYS = [
    "stream_funnel_conversion",
    "stream_sessionize",
    "stream_session_topk",
    "analytics_markov_transitions",
    "window_lag_lead",
]
HOT_USER = 1


def build(spark, n_rows: int, out_dir: str, skewed: bool) -> None:
    from pyspark.sql import functions as F

    hot = (
        f"CASE WHEN id % 10 < 3 THEN {HOT_USER} "
        "ELSE 2 + (id * 2654435761) % 49999 END"
        if skewed
        else "1 + (id * 2654435761) % 50000"
    )
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                "timestamp'2024-01-01 00:00:00' "
                "+ make_interval(0,0,0,0,0,0, id * 50 + (id * 13) % 47)"
            ).alias("ts"),
            F.expr(hot).cast("long").alias("user_id"),
            # LCG hash decorrelated from id % 10 (which selects the hot
            # rows) — matches tests/test_hot_user_skew.py's generator
            F.expr(
                "CASE WHEN (id*1103515245 + 12345) % 2147483648 % 10 = 9 "
                "THEN 'purchase' "
                "WHEN (id*1103515245 + 12345) % 2147483648 % 10 >= 6 "
                "THEN 'click' ELSE 'view' END"
            ).alias("event_type"),
            (F.expr("(id * 37) % 1000") / 10.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    # Spark's parquet writer defaults to INT96 timestamps, which the
    # catalog's ns-detection path cannot raw-read as long — write the
    # fixture in MICROS like the driver's testdata
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, "events.parquet")
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/skew_probe")
    args = ap.parse_args()

    from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
    from go_batch_processor_spark.session import get_spark

    spark = get_spark(
        app_name="gbp-skew-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    _ensure_loaded()

    dirs = {}
    for kind in ("uniform", "skewed"):
        d = os.path.join(args.workdir, kind)
        build(spark, args.rows, d, skewed=(kind == "skewed"))
        dirs[kind] = d
    # warm-up (codegen) outside the timed region
    for k in KEYS:
        REGISTRY[k].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict] = {}
    for k in KEYS:
        row = {}
        for kind, d in dirs.items():
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                REGISTRY[k].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            row[kind] = round(best, 3)
        row["skew_ratio"] = round(row["skewed"] / row["uniform"], 2)
        out[k] = row
        print(f"{k}: {row}", flush=True)

    # the mitigation path: O(1)-state streaming funnel over the SKEWED input
    import tempfile

    from go_batch_processor_spark.streaming import rocksdb_state_store
    from go_batch_processor_spark.streaming.stateful import run_funnel_once

    # the streaming ops read parquet PART FILES from src_dir — point them
    # inside the events.parquet dataset directory, not at its parent
    from go_batch_processor_spark.streaming.stateful import (
        run_funnel_bucketed_once,
    )

    stream_src = os.path.join(dirs["skewed"], "events.parquet")
    schema = spark.read.parquet(stream_src).schema
    n_batch = (
        REGISTRY["stream_funnel_conversion"].fn(spark, dirs["skewed"]).count()
    )
    with rocksdb_state_store(spark):
        for label, op in [
            ("run_funnel_once_skewed", run_funnel_once),
            ("run_funnel_bucketed_skewed", run_funnel_bucketed_once),
        ]:
            ckpt = tempfile.mkdtemp(prefix="gbp_skewfunnel_")
            t0 = time.perf_counter()
            n = op(spark, stream_src, ckpt, schema).filter(
                "kind = 'conversion'"
            ).count()
            out[label] = {
                "sec": round(time.perf_counter() - t0, 3),
                "conversions": n,
                "batch_twin_conversions": n_batch,
            }
            assert n == n_batch > 0, out[label]
    print(json.dumps({"metric": "hot_user_skew", "rows": args.rows, **out}))


if __name__ == "__main__":
    main()
