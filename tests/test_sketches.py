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
