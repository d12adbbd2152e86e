"""Subprocess e2e for the state-family CLI commands: compact, zorder,
quality-audit (each owns its own Ray session)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "deepseek_ocr_ray", *args, "--num-cpus", "4"],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


def _frag_dir(tmp_path, n_files=6, rows=300):
    d = str(tmp_path / "frag")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(n_files):
        pq.write_table(
            pa.table(
                {
                    "a": pa.array(rng.integers(0, 100, rows), pa.int64()),
                    "b": pa.array(rng.integers(0, 100, rows), pa.int64()),
                }
            ),
            os.path.join(d, f"f{i}.parquet"),
        )
    return d


def test_compact_cli(tmp_path):
    src = _frag_dir(tmp_path)
    out = str(tmp_path / "packed")
    r = _run(["compact", "--input", src, "--output", out, "--target-mb", "64"])
    assert r.returncode == 0, r.stderr[-2000:]
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(files) < 6
    total = sum(
        pq.read_table(os.path.join(out, f)).num_rows for f in files
    )
    assert total == 6 * 300


def test_zorder_cli(tmp_path):
    src = _frag_dir(tmp_path)
    out = str(tmp_path / "zc")
    r = _run(
        [
            "zorder", "--input", src, "--output", out,
            "--col1", "a", "--col2", "b", "--files", "4",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert os.path.exists(info["zonemap"])
    files = [
        f for f in os.listdir(out)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    assert len(files) == 4


def test_quality_audit_cli(tmp_path):
    src = _frag_dir(tmp_path)
    r = _run(
        [
            "quality-audit", "--input", src,
            "--not-null", "a",
            "--range", "a:0:50",       # violates (values up to 99)
            "--unique", "a,b",         # duplicates likely -> violates
        ]
    )
    # exit 1 = some check failed, by design
    assert r.returncode == 1, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.strip().splitlines()]
    by = {r_["check_name"]: r_ for r_ in rows}
    assert by["a_not_null"]["passed"] is True
    assert by["a_range_0_50"]["passed"] is False
    assert by["a_range_0_50"]["violations"] > 0


def test_quality_audit_cli_no_checks(tmp_path):
    src = _frag_dir(tmp_path, n_files=1, rows=5)
    r = _run(["quality-audit", "--input", src])
    assert r.returncode == 2


def _value_dir(tmp_path, name, vals):
    d = str(tmp_path / name)
    os.makedirs(d)
    pq.write_table(
        pa.table({"v": pa.array(vals, pa.float64())}),
        os.path.join(d, "part-0.parquet"),
    )
    return d


def test_drift_cli_no_drift(tmp_path):
    """Identical distributions: d_ppm 0, AUC 500000, exit 0."""
    vals = [float(x) for x in range(1, 101)]
    a = _value_dir(tmp_path, "a", vals)
    b = _value_dir(tmp_path, "b", vals)
    r = _run(
        [
            "drift", "--input", a, "--input2", b, "--col", "v",
            "--max-d-ppm", "100000",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = json.loads(r.stdout.strip().splitlines()[-1])
    assert card["ks_d_ppm"] == 0
    assert card["mw_auc_ppm"] == 500000
    assert card["drifted"] is False
    assert (card["n_a"], card["n_b"]) == (100, 100)


def test_drift_cli_detects_shift(tmp_path):
    """A +50 location shift trips the gate: exit 1, drifted true."""
    vals = [float(x) for x in range(1, 101)]
    a = _value_dir(tmp_path, "a", vals)
    b = _value_dir(tmp_path, "b", [v + 50.0 for v in vals])
    r = _run(
        [
            "drift", "--input", a, "--input2", b, "--col", "v",
            "--max-d-ppm", "100000",
        ]
    )
    assert r.returncode == 1, r.stderr[-2000:]
    card = json.loads(r.stdout.strip().splitlines()[-1])
    assert card["drifted"] is True and card["ks_d_ppm"] == 500000
    # AUC < 0.5: side a is stochastically smaller
    assert card["mw_auc_ppm"] < 500000
