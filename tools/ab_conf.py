#!/usr/bin/env python
"""A/B a runtime SQL-conf change over a subset of registry keys, interleaved.

Usage: python tools/ab_conf.py '<json conf dict>' key1 key2 ...

Runs each key alternately with baseline conf and the candidate conf inside
ONE session (runtime-settable SQLConfs only), N reps each (interleaved
A,B,A,B...), reports per-key medians for both arms. Ambient drift hits both
arms equally, so the ratio is trustworthy where a cross-run bench diff is
not (HANDOFF r12: +-6-10% run-to-run on this box).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from go_batch_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "5"))


def main() -> int:
    conf = json.loads(sys.argv[1])
    keys = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark(
        app_name="gbp-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    base = {k: spark.conf.get(k, None) for k in conf}

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    def set_arm(arm: dict[str, str | None]) -> None:
        for k, v in arm.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # warm both arms once (codegen/JIT outside the timed region)
    for name in keys:
        set_arm(base)
        run(name)
        set_arm(conf)
        run(name)

    a: dict[str, list[float]] = {k: [] for k in keys}
    b: dict[str, list[float]] = {k: [] for k in keys}
    for rep in range(REPS):
        for name in keys:
            # Alternate within-pair order per rep: the run immediately
            # following another run of the same key is systematically
            # ~10-15% faster (page cache, JIT, GC state), so a fixed
            # base-then-cand order biases every ratio toward the
            # candidate. Alternating cancels the bias in the median.
            if rep % 2 == 0:
                set_arm(base)
                a[name].append(run(name))
                set_arm(conf)
                b[name].append(run(name))
            else:
                set_arm(conf)
                b[name].append(run(name))
                set_arm(base)
                a[name].append(run(name))

    ta = tb = 0.0
    print(f"{'key':42s} {'base':>8s} {'cand':>8s} {'ratio':>6s}")
    for name in keys:
        ma, mb = statistics.median(a[name]), statistics.median(b[name])
        ta += ma
        tb += mb
        print(f"{name:42s} {ma:8.3f} {mb:8.3f} {mb / ma:6.3f}")
    print(f"{'TOTAL':42s} {ta:8.3f} {tb:8.3f} {tb / ta:6.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
