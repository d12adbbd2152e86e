"""compact_parquet: file-count reduction, content equality, idempotence."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from deepseek_ocr_ray.state.compact import compact_parquet


def _frag_dir(tmp_path, n_files: int, rows_per: int) -> str:
    d = str(tmp_path / "frags")
    os.makedirs(d)
    for i in range(n_files):
        base = i * rows_per
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(range(base, base + rows_per), pa.int64()),
                    "text": pa.array(
                        [f"row-{k}" for k in range(base, base + rows_per)],
                        pa.string(),
                    ),
                }
            ),
            os.path.join(d, f"part-{i:04d}.parquet"),
        )
    return d


def _read_sorted(path: str) -> pa.Table:
    ds = ray.data.read_parquet(path)
    return pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    ).sort_by("id")


def test_compaction_reduces_files_and_preserves_rows(ray_session, tmp_path):
    src = _frag_dir(tmp_path, 24, 50)
    out = str(tmp_path / "compact")
    in_bytes = sum(
        os.path.getsize(os.path.join(src, f)) for f in os.listdir(src)
    )
    m = compact_parquet(src, out, target_bytes=in_bytes // 3)
    assert m["n_input_files"] == 24
    assert m["rows"] == 24 * 50
    assert 1 <= m["n_output_files"] <= 6  # ~3 target + split slack
    assert m["n_output_files"] < 24
    before = _read_sorted(src)
    after = _read_sorted(out)
    assert after.equals(before)


def test_compaction_idempotent_and_refreshes_on_change(ray_session, tmp_path):
    src = _frag_dir(tmp_path, 6, 10)
    out = str(tmp_path / "compact")
    m1 = compact_parquet(src, out, target_bytes=1 << 30)
    stamp = os.path.getmtime(os.path.join(out, "_COMPACTION.json"))
    m2 = compact_parquet(src, out, target_bytes=1 << 30)
    assert m2 == m1  # reused, not rewritten
    assert os.path.getmtime(os.path.join(out, "_COMPACTION.json")) == stamp

    # input grows → fingerprint changes → recompacted
    pq.write_table(
        pa.table(
            {
                "id": pa.array([999_999], pa.int64()),
                "text": pa.array(["late"], pa.string()),
            }
        ),
        os.path.join(src, "part-late.parquet"),
    )
    m3 = compact_parquet(src, out, target_bytes=1 << 30)
    assert m3["rows"] == 61 and m3["n_input_files"] == 7
    assert _read_sorted(out).num_rows == 61


def test_compaction_column_prune_and_empty_input(ray_session, tmp_path):
    src = _frag_dir(tmp_path, 4, 5)
    out = str(tmp_path / "pruned")
    compact_parquet(src, out, target_bytes=1 << 30, columns=["id"])
    t = _read_sorted(out)
    assert t.column_names == ["id"] and t.num_rows == 20

    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(str(tmp_path / "nothing"), str(tmp_path / "x"))


def test_compaction_manifest_contents(ray_session, tmp_path):
    src = _frag_dir(tmp_path, 3, 4)
    out = str(tmp_path / "m")
    m = compact_parquet(src, out, target_bytes=1 << 30)
    with open(os.path.join(out, "_COMPACTION.json")) as fh:
        assert json.load(fh) == m
