"""Bloom filter + bloom-prefiltered semi-join (stages/bloom.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages import bloom


def test_bloom_no_false_negatives_and_low_fp():
    keys = pa.array(list(range(0, 20000, 2)), pa.int64())  # evens
    words = bloom.bloom_partial(keys)
    # every inserted key hits
    assert bloom.bloom_contains(
        words, keys, bloom.DEFAULT_M_BITS, bloom.DEFAULT_K
    ).all()
    # odd keys (never inserted) almost never hit
    probes = pa.array(list(range(1, 20001, 2)), pa.int64())
    fp = bloom.bloom_contains(
        words, probes, bloom.DEFAULT_M_BITS, bloom.DEFAULT_K
    ).mean()
    assert fp < 0.01


def test_bloom_partial_merge_is_union():
    a = pa.array([1, 2, 3], pa.int64())
    b = pa.array([100, 200], pa.int64())
    merged = bloom.bloom_partial(a) | bloom.bloom_partial(b)
    both = pa.array([1, 2, 3, 100, 200], pa.int64())
    assert bloom.bloom_contains(
        merged, both, bloom.DEFAULT_M_BITS, bloom.DEFAULT_K
    ).all()


def test_bloom_string_keys():
    keys = pa.array([f"doc-{i}" for i in range(1000)], pa.string())
    words = bloom.bloom_partial(keys)
    assert bloom.bloom_contains(
        words, keys, bloom.DEFAULT_M_BITS, bloom.DEFAULT_K
    ).all()


def test_bloom_semi_join_exact_vs_naive(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    lkeys = rng.randint(0, 50, 200)
    left = pa.table(
        {
            "k": pa.array(lkeys.tolist(), pa.int64()),
            "v": pa.array(range(200), pa.int64()),
        }
    )
    rkeys = rng.randint(25, 75, 60)
    right = pa.table({"rk": pa.array(rkeys.tolist(), pa.int64())})
    got = bloom.bloom_semi_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        left_on="k",
        right_on="rk",
    ).to_pandas()
    rset = set(rkeys.tolist())
    want = sorted(v for k, v in zip(lkeys.tolist(), range(200)) if k in rset)
    assert sorted(got.v.tolist()) == want
    assert list(got.columns) == ["k", "v"]


def test_bloom_semi_join_inexact_superset(ray_session):
    """exact=False returns a SUPERSET containing every true match."""
    import ray.data

    left = pa.table(
        {
            "k": pa.array(list(range(100)), pa.int64()),
            "v": pa.array(list(range(100)), pa.int64()),
        }
    )
    right = pa.table({"rk": pa.array([5, 50, 95], pa.int64())})
    got = bloom.bloom_semi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_on="k",
        right_on="rk",
        exact=False,
    ).to_pandas()
    assert {5, 50, 95} <= set(got.v.tolist())


def test_bloom_semi_join_empty_right(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([1, 2], pa.int64())})
    right = pa.table({"rk": pa.array([], pa.int64())})
    got = bloom.bloom_semi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_on="k",
        right_on="rk",
    )
    assert got.count() == 0
