"""read_parquet_evolved: version grouping, align (missing->null, safe
cast, extra dropped), lossy-cast loudness, version cap."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from deepseek_ocr_ray.sources.evolved import (
    read_parquet_evolved,
    schema_versions,
)

SCHEMA = {
    "id": pa.int64(),
    "name": pa.string(),
    "score": pa.int64(),
}


def _write_gens(tmp_path):
    a = pa.table({"id": pa.array([1, 2], pa.int32())})  # narrow + missing
    b = pa.table(
        {
            "id": pa.array([3, 4], pa.int64()),
            "name": pa.array(["x", "y"], pa.string()),
            "score": pa.array([10, 20], pa.int64()),
            "extra": pa.array([9, 9], pa.int64()),  # undeclared: dropped
        }
    )
    pa_ = str(tmp_path / "gen_a.parquet")
    pb_ = str(tmp_path / "gen_b.parquet")
    pq.write_table(a, pa_)
    pq.write_table(b, pb_)
    return [pa_, pb_]


def test_versions_and_align(ray_session, tmp_path):
    paths = _write_gens(tmp_path)
    groups = schema_versions(paths)
    assert len(groups) == 2
    got = (
        read_parquet_evolved(paths, SCHEMA)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == ["id", "name", "score"]
    assert got["id"].tolist() == [1, 2, 3, 4]  # int32 widened
    assert got["name"].tolist()[:2] == [None, None]
    assert got["score"].tolist()[2:] == [10, 20]
    import pandas as pd

    assert pd.isna(got["score"][0]) and pd.isna(got["score"][1])


def test_lossy_cast_raises(ray_session, tmp_path):
    wide = pa.table({"id": pa.array([2**40], pa.int64())})
    p = str(tmp_path / "wide.parquet")
    pq.write_table(wide, p)
    with pytest.raises(Exception):
        read_parquet_evolved([p], {"id": pa.int32()}).materialize()


def test_version_cap_and_empty(ray_session, tmp_path):
    paths = _write_gens(tmp_path)
    with pytest.raises(ValueError, match="max_versions"):
        read_parquet_evolved(paths, SCHEMA, max_versions=1)
    with pytest.raises(ValueError, match="no input files"):
        read_parquet_evolved([], SCHEMA)
    with pytest.raises(ValueError, match="at least one column"):
        read_parquet_evolved(paths, {})


def test_same_schema_single_read(ray_session, tmp_path):
    t = pa.table({"id": pa.array([1], pa.int64())})
    p1, p2 = str(tmp_path / "x1.parquet"), str(tmp_path / "x2.parquet")
    pq.write_table(t, p1)
    pq.write_table(t, p2)
    assert len(schema_versions([p1, p2])) == 1
    got = read_parquet_evolved([p1, p2], {"id": pa.int64()}).to_pandas()
    assert sorted(got["id"]) == [1, 1]
