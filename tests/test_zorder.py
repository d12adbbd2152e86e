"""zorder: Morton kernel properties, clustering write, BOTH-column
zone-map pruning with exactness vs brute, validation."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from deepseek_ocr_ray.state.zonemap import build_zonemap, scan_pruned
from deepseek_ocr_ray.state.zorder import zorder_key, zorder_write


def test_morton_kernel_reference():
    """Bit-interleave matches a per-value Python reference."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, 200).astype(np.int64)
    y = rng.integers(0, 1 << 16, 200).astype(np.int64)
    got = zorder_key([x, y], [0, 0], [(1 << 16) - 1, (1 << 16) - 1])

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = np.array([ref(int(a), int(b)) for a, b in zip(x, y)], np.int64)
    assert (got == want).all()


def test_morton_locality_property():
    """Points close in BOTH dims are close in z; a far jump in either
    dim moves the key far (prefix property of the interleave)."""
    base = zorder_key(
        [np.array([100]), np.array([100])], [0, 0], [65535, 65535]
    )[0]
    near = zorder_key(
        [np.array([101]), np.array([100])], [0, 0], [65535, 65535]
    )[0]
    far = zorder_key(
        [np.array([100]), np.array([40000])], [0, 0], [65535, 65535]
    )[0]
    assert abs(near - base) < abs(far - base)


def test_cluster_write_and_both_column_pruning(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 20000
    tbl = pa.table(
        {
            "a": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "b": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    out = str(tmp_path / "zc")
    zorder_write(
        ray.data.from_arrow(tbl).repartition(8), ["a", "b"], out, n_files=16
    )
    data_files = [
        f for f in os.listdir(out) if f.endswith(".parquet") and not f.startswith("_")
    ]
    assert len(data_files) == 16
    build_zonemap(out, ["a", "b"])
    full = tbl.to_pandas()
    for col in ("a", "b"):
        ds, read, total = scan_pruned(out, col, 100, 199, columns=["a", "b", "v"])
        assert read < total  # the zone map prunes on BOTH columns
        got = ds.to_pandas()
        want = full[(full[col] >= 100) & (full[col] <= 199)]
        assert len(got) == len(want)
        assert int(got["v"].sum()) == int(want["v"].sum())


def test_content_preserved(ray_session, tmp_path):
    tbl = pa.table(
        {
            "a": pa.array([5, 1, 9, 3], pa.int64()),
            "b": pa.array([2, 8, 4, 6], pa.int64()),
        }
    )
    out = str(tmp_path / "zc2")
    zorder_write(ray.data.from_arrow(tbl), ["a", "b"], out, n_files=2)
    back = pa.concat_tables(
        [
            pq.read_table(os.path.join(out, f))
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet") and not f.startswith("_")
        ]
    ).to_pandas()
    assert sorted(back.columns) == ["a", "b"]  # _z dropped
    assert sorted(zip(back["a"], back["b"])) == [(1, 8), (3, 6), (5, 2), (9, 4)]


def test_validation(ray_session, tmp_path):
    tbl = pa.table(
        {
            "a": pa.array([1], pa.int64()),
            "b": pa.array([1.5], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="exactly 2"):
        zorder_write(ds, ["a"], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="must be integer"):
        zorder_write(ds, ["a", "b"], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="not in the input"):
        zorder_write(ds, ["a", "zz"], str(tmp_path / "x"))
