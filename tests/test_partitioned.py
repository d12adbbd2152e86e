"""write_partitioned / partition_values / read_partitions: layout,
atomicity manifest, discovery (incl. URL-encoded values), pruned reads,
loud errors."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.state.partitioned import (
    partition_values,
    read_partitions,
    write_partitioned,
)

TBL = pa.table(
    {
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "g": pa.array(
            ["a", "b", "a", "c with space", "b", "a"], pa.string()
        ),
        "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    }
)


def _write(tmp_path, nblocks=2) -> str:
    root = str(tmp_path / "tree")
    write_partitioned(
        ray.data.from_arrow(TBL).repartition(nblocks), root, ["g"]
    )
    return root


def test_layout_and_manifest(ray_session, tmp_path):
    root = _write(tmp_path)
    assert os.path.exists(os.path.join(root, "_PARTITIONED.json"))
    dirs = sorted(d for d in os.listdir(root) if "=" in d)
    assert len(dirs) == 3 and all(d.startswith("g=") for d in dirs)
    assert not os.path.exists(root + ".tmp")


def test_discovery_unquotes(ray_session, tmp_path):
    root = _write(tmp_path)
    assert partition_values(root) == ["a", "b", "c with space"]
    with pytest.raises(ValueError, match="partitioned by"):
        partition_values(root, "k")


def test_pruned_read_exact(ray_session, tmp_path):
    root = _write(tmp_path)
    got = (
        read_partitions(root, ["a", "c with space"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        TBL.to_pandas()
        .query("g in ('a', 'c with space')")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    for c in ["k", "g", "v"]:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist()


def test_missing_value_errors(ray_session, tmp_path):
    root = _write(tmp_path)
    with pytest.raises(ValueError, match="not present"):
        read_partitions(root, ["a", "zzz"])
    got = read_partitions(root, ["a", "zzz"], missing_ok=True).to_pandas()
    assert set(got["g"]) == {"a"}
    with pytest.raises(ValueError, match="no requested partition"):
        read_partitions(root, ["zzz"], missing_ok=True)


def test_not_a_tree_errors(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="_PARTITIONED.json"):
        partition_values(str(tmp_path))


def test_rewrite_replaces_atomically(ray_session, tmp_path):
    root = _write(tmp_path)
    smaller = TBL.filter(pa.compute.equal(TBL["g"], "a"))
    write_partitioned(ray.data.from_arrow(smaller), root, ["g"])
    assert partition_values(root) == ["a"]


def test_max_partitions(ray_session, tmp_path):
    with pytest.raises(ValueError, match="max_partitions"):
        write_partitioned(
            ray.data.from_arrow(TBL),
            str(tmp_path / "t2"),
            ["g"],
            max_partitions=2,
        )
