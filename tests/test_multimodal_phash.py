"""Property tests for the perceptual-hash kernel and its cluster query
(rows-only: the DCT has no SQL twin, so correctness lands here)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from go_batch_processor_spark.operators.multimodal import _PHASH_SIDE, _phash_kernel
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _hamming(a: int, b: int) -> int:
    return bin((a & (2**64 - 1)) ^ (b & (2**64 - 1))).count("1")


def _payload(seed: int, n: int = 2048) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()


def test_phash_deterministic_and_identity():
    p = _payload(1)
    h1 = _phash_kernel(pd.Series([p, p, _payload(2)]))
    assert h1.iloc[0] == h1.iloc[1]
    assert h1.iloc[0] != h1.iloc[2]
    h2 = _phash_kernel(pd.Series([p]))
    assert h1.iloc[0] == h2.iloc[0]


def test_phash_brightness_invariant():
    """Adding a constant to every pixel only moves the DCT's DC term,
    which pHash drops — the classic perceptual-hash invariance."""
    side2 = _PHASH_SIDE * _PHASH_SIDE
    base = (np.random.default_rng(7).integers(0, 200, side2, dtype=np.uint8)).tobytes()
    brighter = (np.frombuffer(base, dtype=np.uint8) + 40).astype(np.uint8).tobytes()
    h = _phash_kernel(pd.Series([base, brighter]))
    assert h.iloc[0] == h.iloc[1]


def test_phash_small_perturbation_vs_different_image():
    """A few flipped bytes should move far fewer hash bits than an
    unrelated image (near-dup detectability)."""
    side2 = _PHASH_SIDE * _PHASH_SIDE
    a = np.random.default_rng(11).integers(0, 256, side2, dtype=np.uint8)
    b = a.copy()
    b[:8] = (b[:8] + 3) % 256  # tiny local perturbation
    c = np.random.default_rng(13).integers(0, 256, side2, dtype=np.uint8)
    h = _phash_kernel(pd.Series([a.tobytes(), b.tobytes(), c.tobytes()]))
    d_near = _hamming(int(h.iloc[0]), int(h.iloc[1]))
    d_far = _hamming(int(h.iloc[0]), int(h.iloc[2]))
    assert d_near < d_far
    assert d_near <= 10


def test_phash_cluster_query_groups_injected_dupes(spark, sf_dir):
    out = REGISTRY["multimodal_image_phash"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    # every injected duplicate pairs with its original: canonical id is the
    # original (pre-offset) id and the cluster has exactly the two copies
    # unless distinct payloads collide (none do in the fixture corpus)
    for row in out:
        assert row.n_members >= 2
        assert row.canonical_id < 1_000_000
