"""Chaos tests for the pipeline layer's R7/R8 contract on REAL Spark
failures (VERDICT r12 item 3). The reference's panic isolation
(/root/reference/batch_processor.go:169-180) was pytest-pinned at the
Python layer only; nothing had ever injected an executor-side task
failure or killed a streaming query mid-epoch:

1. TRANSIENT task failure: a transform that throws on (partition 0,
   attempt 0) must be absorbed by spark.task.maxFailures retry — the
   pipeline layer sees a CLEAN batch (no error-channel entry, complete
   sink output). Needs master local[2,2] (the test session's local[4]
   has maxFailures=1), so it runs in a subprocess with its own JVM.
2. PERMANENT task failure: a transform that throws on every attempt
   exhausts retries; the job failure surfaces in foreachBatch and must
   land on the ERROR CHANNEL (R8: recorded + finalizer(None, exc)) while
   the query itself still terminates (panic isolated, not propagated).
3. MID-STREAM KILL + RESTART, exactly-once: a foreachBatch sink killed
   AFTER its state version committed but BEFORE Spark's epoch commit
   forces the restarted query to REPLAY that epoch; the idempotent
   epoch-keyed merge (IncrementalMVRefresh._state_before) must yield the
   exact batch ground truth — no double count.
"""
from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_transient_task_failure_absorbed_by_retry(tmp_path):
    """R7 under a real executor-side failure: (partition 0, attempt 0)
    raises inside mapInPandas; with spark.task.maxFailures=2 the retry
    succeeds and the PIPELINE layer never sees an error. Subprocess:
    the retry count is a SparkContext property (master local[2,2]) the
    session fixture can't change."""
    script = textwrap.dedent(
        """
        import json, sys
        sys.path.insert(0, sys.argv[1])
        src, sink = sys.argv[2], sys.argv[3]
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2,2]")  # 2 task attempts
            .appName("gbp-chaos-transient")
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        df = spark.range(100).selectExpr("id", "id * 2 AS v")
        df.repartition(2).write.mode("overwrite").parquet(src)
        source = spark.readStream.schema("id long, v long").parquet(src)

        def flaky(it):
            from pyspark import TaskContext

            tc = TaskContext.get()
            if tc.partitionId() == 0 and tc.attemptNumber() == 0:
                raise RuntimeError("chaos: transient task failure")
            yield from it

        from go_batch_processor_spark.pipeline.foreach_batch import (
            ForeachBatchPipeline,
        )

        finalized = []
        pipe = ForeachBatchPipeline(
            spark,
            source,
            processor=lambda b: b.mapInPandas(flaky, b.schema),
            sink_path=sink,
            finalizer=lambda out, exc: finalized.append(exc),
        )
        pipe.run_available_now()
        n = spark.read.parquet(sink).count()
        print(json.dumps({
            "errors": len(pipe.errors),
            "batches": pipe.batches_seen,
            "finalized_excs": sum(1 for e in finalized if e is not None),
            "rows": n,
        }))
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script, ROOT, str(tmp_path / "src"),
         str(tmp_path / "sink")],
        capture_output=True,
        text=True,
        # generous: a fresh JVM + streaming query under a loaded box
        # (concurrent sweeps) has been observed to blow a 300 s budget
        timeout=900,
        check=True,
    )
    import json

    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {"errors": 0, "batches": 1, "finalized_excs": 0, "rows": 100}, (
        got,
        out.stderr[-2000:],
    )


def test_permanent_task_failure_lands_on_error_channel(spark, tmp_path):
    """R8 under a real executor-side failure: every attempt raises, the
    Spark job fails after maxFailures, and the pipeline's error channel
    + finalizer(None, exc) receive it while the streaming query itself
    completes (the panic is isolated at the batch boundary, exactly the
    reference's recover() contract)."""
    from go_batch_processor_spark.pipeline.foreach_batch import (
        ForeachBatchPipeline,
    )

    src = str(tmp_path / "src")
    spark.range(50).selectExpr("id", "id * 2 AS v").write.parquet(src)
    source = spark.readStream.schema("id long, v long").parquet(src)

    def poison(it):
        raise RuntimeError("chaos: permanent task failure")
        yield  # pragma: no cover — generator shape

    finalized = []
    pipe = ForeachBatchPipeline(
        spark,
        source,
        processor=lambda b: b.mapInPandas(poison, b.schema),
        sink_path=str(tmp_path / "sink"),
        finalizer=lambda out, exc: finalized.append((out, exc)),
    )
    pipe.run_available_now()  # must NOT raise: the error is channelled
    assert pipe.batches_seen == 1
    assert len(pipe.errors) == 1
    assert "permanent task failure" in str(pipe.errors[0])
    assert len(finalized) == 1
    out, exc = finalized[0]
    assert out is None and exc is pipe.errors[0]


def test_mv_refresh_mid_stream_kill_then_restart_exactly_once(
    spark, sf_dir, tmp_path
):
    """The end-to-end exactly-once proof on the replay machinery VERDICT
    r12 item 3 names: kill the query AFTER epoch 1's state version
    committed but BEFORE Spark's offset-log commit (raise on the way out
    of foreachBatch), restart on the SAME checkpoint — Spark re-delivers
    epoch 1, merge_batch rebuilds it from _state_before (v=0), and the
    final state equals the from-scratch batch aggregate exactly."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.errors import StreamingQueryException

    from go_batch_processor_spark.catalog import TABLE_SCHEMAS, load_table
    from go_batch_processor_spark.streaming.mv_refresh import (
        IncrementalMVRefresh,
    )

    orders_dir = str(tmp_path / "orders_files")
    load_table(spark, sf_dir, "orders").repartition(3).write.parquet(orders_dir)
    ckpt = str(tmp_path / "ckpt")
    mv = IncrementalMVRefresh(
        spark, str(tmp_path / "state"), key="o_custkey", value="o_totalprice"
    )

    def make_source():
        return (
            spark.readStream.schema(TABLE_SCHEMAS["orders"])
            .option("maxFilesPerTrigger", "1")
            .parquet(orders_dir)
        )

    seen: list[int] = []

    def killing_merge(batch_df, epoch_id):
        mv.merge_batch(batch_df, epoch_id)  # state version COMMITTED ...
        seen.append(epoch_id)
        if len(seen) == 2:
            # ... then die before foreachBatch returns: Spark's epoch
            # commit never lands, so the restart MUST replay this epoch
            raise RuntimeError("chaos: kill after state write")

    q1 = (
        make_source()
        .writeStream.foreachBatch(killing_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="kill after state write"):
        q1.awaitTermination()

    q2 = (
        make_source()
        .writeStream.foreachBatch(mv.merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    killed_epoch = seen[-1]
    assert os.path.isdir(os.path.join(str(tmp_path / "state"), f"v={killed_epoch}"))

    got = (
        mv.current_state()
        .select("o_custkey", "n", F.round("s", 2).alias("s"))
        .toPandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    exp = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .toPandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
