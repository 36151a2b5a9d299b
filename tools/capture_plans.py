#!/usr/bin/env python
"""Capture .explain('formatted') for named registry keys into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> key1 key2 ...
       python tools/capture_plans.py r13 before graph_pagerank ...

Writes plans/<tag>/<key>_<suffix>.txt. Plans are the pre-execution
(initial AQE) physical plans — enough to show Exchange counts, join
strategies, PushedFilters/ReadSchema and Python-eval nodes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from go_batch_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(tag: str, suffix: str, keys: list[str]) -> int:
    _ensure_loaded()
    spark = get_spark(app_name="gbp-plans")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for k in keys:
        df = REGISTRY[k].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        n_py = txt.count("EvalPython") + txt.count("MapInArrow") + txt.count("MapInPandas") + txt.count("FlatMapGroupsInPandas")
        joins = [w for w in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct") if w in txt]
        print(f"{k}: exchanges={n_exch} python_nodes={n_py} joins={joins} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
