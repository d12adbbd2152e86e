"""Zone maps: footer-only stats, file pruning, residual exactness,
staleness, idempotence."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deepseek_ocr_ray.state.zonemap import (
    ZONEMAP_DIR,
    build_zonemap,
    pruned_files,
    scan_pruned,
)


def _write(dirp: str, name: str, v, s=None, **kw) -> str:
    cols = {"v": pa.array(v, pa.int64())}
    cols["s"] = pa.array(
        s if s is not None else [f"k{x:04d}" if x is not None else None for x in v],
        pa.string(),
    )
    p = os.path.join(dirp, name)
    pq.write_table(pa.table(cols), p, **kw)
    return p


@pytest.fixture()
def zdir(tmp_path, ray_session):
    d = str(tmp_path / "data")
    os.makedirs(d)
    # disjoint sorted ranges ...
    _write(d, "f0.parquet", list(range(0, 100)))
    _write(d, "f1.parquet", list(range(100, 200)))
    _write(d, "f2.parquet", list(range(200, 300)))
    # ... one wide overlapping file, one all-null, one stats-less
    _write(d, "f3.parquet", [50, 250])
    _write(d, "f4.parquet", [None, None], s=["a", "b"])
    _write(d, "f5.parquet", [400, 410], write_statistics=False)
    build_zonemap(d, ["v", "s"])
    return d


def test_pruning_and_exactness(zdir, ray_session):
    keep, total = pruned_files(zdir, "v", 120, 180)
    assert total == 6
    # f1 overlaps, f3 (wide) overlaps, f5 (no stats) kept conservatively;
    # f0/f2 disjoint, f4 all-null provably disjoint
    assert sorted(os.path.basename(f) for f in keep) == [
        "f1.parquet", "f3.parquet", "f5.parquet",
    ]
    ds, n_read, n_total = scan_pruned(zdir, "v", 120, 180)
    assert (n_read, n_total) == (3, 6)
    got = sorted(ds.to_pandas()["v"].tolist())
    assert got == list(range(120, 181))  # BETWEEN is inclusive; 50/250/400 excluded


def test_boundary_inclusive(zdir, ray_session):
    keep, _ = pruned_files(zdir, "v", 99, 99)  # == f0's max
    assert "f0.parquet" in {os.path.basename(f) for f in keep}
    ds, _, _ = scan_pruned(zdir, "v", 99, 100)
    assert sorted(ds.to_pandas()["v"].tolist()) == [99, 100]


def test_string_column_pruning(zdir, ray_session):
    keep, total = pruned_files(zdir, "s", "k0110", "k0150")
    names = sorted(os.path.basename(f) for f in keep)
    # f4's s column has values a..b (disjoint), f5 stats-less (kept)
    assert names == ["f1.parquet", "f3.parquet", "f5.parquet"]
    ds, _, _ = scan_pruned(zdir, "s", "k0110", "k0150", columns=["s"])
    assert len(ds.to_pandas()) == 41


def test_empty_selection_typed(zdir, ray_session):
    import ray as _ray

    # f5 is stats-less so it is conservatively read, then the residual
    # filter empties it — the blocks must STAY typed (Ray's to_pandas
    # drops the schema of an all-empty dataset; the Arrow refs — what
    # the driver compare consumes — are the contract)
    ds, n_read, n_total = scan_pruned(zdir, "v", -50, -10)
    assert (n_read, n_total) == (1, 6)
    tbls = _ray.get(ds.to_arrow_refs())
    assert all(t.num_rows == 0 for t in tbls)
    assert any(t.column_names == ["v", "s"] for t in tbls)
    # f5 is stats-less and thus always kept — the all-pruned branch is
    # exercised by test_timestamp_pruning's out-of-range scan
    ds2, n_read2, _ = scan_pruned(zdir, "v", 10_000, 20_000)
    assert n_read2 == 1  # only stats-less f5 survives pruning
    assert ds2.schema().names == ["v", "s"]


def test_stale_manifest_raises_and_rebuild(zdir, ray_session):
    _write(zdir, "f6.parquet", [500])
    with pytest.raises(ValueError, match="stale"):
        pruned_files(zdir, "v", 0, 1000)
    build_zonemap(zdir, ["v", "s"])  # fingerprint changed → rebuild
    keep, total = pruned_files(zdir, "v", 490, 510)
    assert total == 7
    assert "f6.parquet" in {os.path.basename(f) for f in keep}


def test_idempotent_build(zdir, ray_session):
    marker = os.path.join(zdir, ZONEMAP_DIR, "_ZONEMAP.json")
    before = os.path.getmtime(marker)
    build_zonemap(zdir, ["v", "s"])
    assert os.path.getmtime(marker) == before


def test_timestamp_pruning(tmp_path, ray_session):
    d = str(tmp_path / "ts")
    os.makedirs(d)
    base = np.datetime64("2000-01-01", "us")
    day = np.timedelta64(86400_000_000, "us")
    for i in range(4):
        ts = pa.array(
            [base + day * (i * 10 + j) for j in range(10)], pa.timestamp("us")
        )
        pq.write_table(pa.table({"ts": ts, "x": pa.array(range(10), pa.int64())}),
                       os.path.join(d, f"t{i}.parquet"))
    build_zonemap(d, ["ts"])
    lo = pa.scalar("2000-01-12").cast(pa.timestamp("us")).as_py()
    hi = pa.scalar("2000-01-14").cast(pa.timestamp("us")).as_py()
    ds, n_read, n_total = scan_pruned(d, "ts", lo, hi)
    assert (n_read, n_total) == (1, 4)
    assert len(ds.to_pandas()) == 3
    # every file has stats → an out-of-range scan prunes ALL files and
    # returns the typed empty directly
    lo2 = pa.scalar("1990-01-01").cast(pa.timestamp("us")).as_py()
    hi2 = pa.scalar("1990-12-31").cast(pa.timestamp("us")).as_py()
    ds0, n_read0, _ = scan_pruned(d, "ts", lo2, hi2)
    assert n_read0 == 0
    assert ds0.schema().names == ["ts", "x"]
    assert ds0.count() == 0


def test_missing_manifest_and_empty_dir(tmp_path, ray_session):
    d = str(tmp_path / "nomap")
    os.makedirs(d)
    with pytest.raises(FileNotFoundError, match="no parquet"):
        build_zonemap(d, ["v"])
    _write(d, "a.parquet", [1])
    with pytest.raises(FileNotFoundError, match="zone map"):
        pruned_files(d, "v", 0, 1)
