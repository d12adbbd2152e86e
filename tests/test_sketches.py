"""HyperLogLog sketch + exact-distinct companion."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages import sketches


def _ds(values, blocks=4):
    import ray.data

    tbl = pa.table({"v": pa.array([str(v) for v in values], pa.string())})
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_hll_estimate_error_bound():
    """p=12 → standard error 1.04/sqrt(4096) ≈ 1.6%; assert within 5%."""
    values = [f"item-{i}" for i in range(10_000)]
    regs = sketches.hll_partial(values, p=12)
    est = sketches.hll_estimate(regs)
    assert abs(est - 10_000) / 10_000 < 0.05


def test_hll_small_range_linear_counting():
    values = [f"x{i}" for i in range(50)]
    est = sketches.hll_estimate(sketches.hll_partial(values, p=12))
    assert abs(est - 50) <= 2  # linear-counting regime is near-exact


def test_hll_merge_equals_union():
    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(3000)] + a[:1000]  # overlap
    merged = sketches.hll_merge(
        sketches.hll_partial(a, p=12), sketches.hll_partial(b, p=12)
    )
    assert np.array_equal(
        merged, sketches.hll_partial(a + b, p=12)
    )  # merge == sketch of union, exactly


def test_hll_distinct_dataset_parallelism_invariant(ray_session):
    values = [f"doc-{i % 700}" for i in range(5000)]  # 700 distinct
    ests = [
        sketches.hll_distinct(_ds(values, blocks=b), "v").take_all()[0][
            "approx_distinct"
        ]
        for b in (1, 4, 11)
    ]
    assert ests[0] == ests[1] == ests[2]  # register merges are exact
    assert abs(ests[0] - 700) / 700 < 0.05


def test_exact_distinct(ray_session):
    values = [f"doc-{i % 700}" for i in range(5000)]
    out = sketches.exact_distinct(_ds(values), "v").take_all()
    assert out[0]["n_distinct"] == 700


def test_hll_estimate_no_large_range_distortion():
    # Registers saturated high enough that the raw estimate sits in the
    # regime where the (removed) 32-bit large-range correction used to fire:
    # est ≈ alpha*m*2^24 ≈ 5e10 > 2^32 — the old branch took log of a
    # negative number (NaN → int() raised).  With 64-bit hashes the raw
    # estimator is correct here and must come back finite and positive.
    regs = np.full(1 << 12, 24, dtype=np.uint8)
    est = sketches.hll_estimate(regs)
    m = float(1 << 12)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    expected = alpha * m * m / (m * 2.0 ** -24.0)
    assert est > (1 << 32)  # genuinely in the old broken regime
    assert abs(est - expected) / expected < 1e-9


def test_hll_estimate_mid_range_monotone():
    # across the old correction boundary (~2^32/30) estimates must be
    # monotone in register mass — the removed branch bent them upward
    ests = [
        sketches.hll_estimate(np.full(1 << 12, r, dtype=np.uint8))
        for r in (14, 16, 18, 20, 22)
    ]
    assert all(b > a for a, b in zip(ests, ests[1:]))
