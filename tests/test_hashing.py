"""Vectorized stable-hash helpers (hashing.py) + the fast sampling path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deepseek_ocr_ray.hashing import (
    hash64_array,
    id_bucket_array,
    mix64,
    string_hash64,
)

_P = 0x100000001B3
_M = 1 << 64
_GOLD = 0x9E3779B97F4A7C15


def _ref_hash(s: str | None) -> int:
    """Pure-Python reference of the vectorized polynomial string hash."""
    if s is None:
        return _GOLD
    b = s.encode()
    h = 0
    for ch in b:
        h = (h * _P + ch + 1) % _M
    h ^= (len(b) * _GOLD) % _M
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) % _M
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) % _M
    h ^= h >> 33
    return h


VALS = ["", "a", "ab", "ba", "hello world", "x" * 500, None, "doc-17",
        "\x00\x00", "\x00", "é漢字"]


def test_string_hash_matches_reference():
    got = string_hash64(pa.array(VALS, pa.string()))
    exp = np.array([_ref_hash(v) for v in VALS], np.uint64)
    assert np.array_equal(got, exp)


def test_string_hash_layout_invariant():
    """Chunked, sliced, and large_string layouts hash identically —
    the property every keyed exchange depends on."""
    arr = pa.array(VALS, pa.string())
    exp = string_hash64(arr)
    chunked = pa.chunked_array([VALS[:4], VALS[4:]], pa.string())
    assert np.array_equal(string_hash64(chunked), exp)
    assert np.array_equal(string_hash64(arr.slice(3, 6)), exp[3:9])
    assert np.array_equal(string_hash64(arr.cast(pa.large_string())), exp)


def test_string_hash_distribution_and_uniqueness():
    big = pa.array([f"doc-{i}" for i in range(100_000)])
    h = string_hash64(big)
    assert len(np.unique(h)) == 100_000  # no collisions at this scale
    counts = np.bincount((h % np.uint64(64)).astype(np.int64), minlength=64)
    assert counts.min() > 100_000 / 64 * 0.9
    assert counts.max() < 100_000 / 64 * 1.1


def test_hash64_int_path_nulls_and_spread():
    arr = pa.array([1, 2, 3, None, -1, 0], pa.int64())
    h = hash64_array(arr)
    assert h[3] == np.uint64(_GOLD)  # null sentinel
    assert len(set(h.tolist())) == 6
    # adjacent ints land in different buckets after the mix
    h2 = mix64(np.arange(10_000, dtype=np.uint64))
    counts = np.bincount((h2 % np.uint64(16)).astype(np.int64), minlength=16)
    assert counts.min() > 10_000 / 16 * 0.85


def test_id_bucket_array_string_range_and_determinism():
    ids = pa.array([f"u{i}" for i in range(5000)])
    b = id_bucket_array(ids, 32)
    vals = b.to_numpy(zero_copy_only=False)
    assert vals.min() >= 0 and vals.max() < 32
    assert np.array_equal(vals, id_bucket_array(ids, 32).to_numpy(
        zero_copy_only=False))
    counts = np.bincount(vals, minlength=32)
    assert counts.min() > 0  # every bucket populated at 5000 ids


def test_deterministic_sample_fast_vs_md5(ray_session):
    """Both methods honor fraction/reproducibility; survivors differ
    (different hash) but both land near the requested rate, and md5 mode
    still matches the documented SQL rule."""
    import hashlib

    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import deterministic_sample

    tbl = pa.table({"id": pa.array(range(4000), pa.int64())})

    def ids(method):
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = deterministic_sample(
            ds, id_col="id", fraction=0.3, method=method
        )
        return set(out.to_pandas()["id"])

    fast, md5 = ids("fast"), ids("md5")
    for s in (fast, md5):
        assert 0.25 < len(s) / 4000 < 0.35
    # md5 mode = the SQL-parity rule, verified against hashlib directly
    exp = {
        i for i in range(4000)
        if int.from_bytes(
            hashlib.md5(f"s42:{i}".encode()).digest()[:4], "big"
        ) % 10000 < 3000
    }
    assert md5 == exp
    assert fast == ids("fast")  # reproducible


def test_stratified_sample_fast_fractions_and_nulls(ray_session):
    import ray.data

    from deepseek_ocr_ray.pipelines.analytics import stratified_sample

    n = 6000
    groups = ["en", "fr", None] * (n // 3)
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "g": pa.array(groups, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = stratified_sample(
        ds, id_col="id", group_col="g",
        fractions={"en": 0.1}, default_fraction=0.6,
    ).to_pandas()
    assert out["g"].notna().all()  # null strata excluded
    en = (out["g"] == "en").sum() / (n // 3)
    fr = (out["g"] == "fr").sum() / (n // 3)
    assert 0.05 < en < 0.15
    assert 0.5 < fr < 0.7
    # parallelism-invariant
    out2 = stratified_sample(
        ray.data.from_arrow(tbl).repartition(11), id_col="id", group_col="g",
        fractions={"en": 0.1}, default_fraction=0.6,
    ).to_pandas()
    assert set(out["id"]) == set(out2["id"])
