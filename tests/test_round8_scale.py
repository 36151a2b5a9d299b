"""Round-8 scale-doctrine pins (VERDICT r7 items 6-7)."""

from __future__ import annotations

import math

from go_batch_processor_spark.operators.similarity import (
    CENTROID_BROADCAST_BUDGET,
    EMB_DIM,
    IVF_NLIST_MAX,
    IVF_NLIST_MIN,
    ivf_nlist,
)


def test_ivf_nlist_stays_broadcastable():
    """The production IVF sizing must (a) track sqrt(N) in the normal
    regime and (b) keep the broadcast centroid table bounded at ANY
    corpus size — nlist scales with sqrt(corpus), never with corpus."""
    for n in (1, 10**3, 10**6, 10**9, 10**12, 10**15):
        nlist = ivf_nlist(n)
        assert IVF_NLIST_MIN <= nlist <= IVF_NLIST_MAX
        # never more cells than sqrt(N) asks for (modulo the floor clamp)
        assert nlist <= max(int(math.isqrt(n)), IVF_NLIST_MIN)
        # the f64 centroid table must fit the broadcast budget
        assert nlist * EMB_DIM * 8 <= CENTROID_BROADCAST_BUDGET

    # normal regime: sqrt scaling exactly
    assert ivf_nlist(10**6) == 1000
    assert ivf_nlist(10**9) == 31622
    # 100 TB regime: clamped, not sqrt
    assert ivf_nlist(10**12) == IVF_NLIST_MAX
    # monotone non-decreasing in corpus size
    sizes = [ivf_nlist(n) for n in (10**3, 10**5, 10**7, 10**9, 10**11, 10**13)]
    assert sizes == sorted(sizes)
