"""table_diff: classification, IS DISTINCT FROM null semantics, mode
parity, layout invariance, validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.state.diff import table_diff


def _ds(rows: dict, nblocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_arrow(pa.table(rows))
    return ds.repartition(nblocks) if nblocks > 1 else ds


def _result(ds: ray.data.Dataset) -> list[tuple]:
    df = ds.to_pandas()
    return sorted(zip(df["k"].tolist(), df["change"].tolist()))


OLD = {
    "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
    "v": pa.array(["a", "b", None, "d", None], pa.string()),
    "n": pa.array([10, 20, 30, 40, 50], pa.int64()),
}
# 1 identical, 2 value change, 3 null→value, 4 value→null, 5 null→null
# identical, 6 added; 2,3,4 changed; nothing deleted yet
NEW = {
    "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    "v": pa.array(["a", "B", "c", None, None, "f"], pa.string()),
    "n": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
}
EXPECT = [(2, "changed"), (3, "changed"), (4, "changed"), (6, "added")]


@pytest.mark.parametrize("mode", ["fingerprint", "columns"])
def test_classification(ray_session, mode):
    got = _result(table_diff(_ds(OLD), _ds(NEW), key_col="k", mode=mode))
    assert got == EXPECT


@pytest.mark.parametrize("mode", ["fingerprint", "columns"])
def test_deleted(ray_session, mode):
    new = {c: a.slice(0, 3) for c, a in NEW.items()}
    got = _result(table_diff(_ds(OLD), _ds(new), key_col="k", mode=mode))
    assert got == [(2, "changed"), (3, "changed"), (4, "deleted"), (5, "deleted")]


def test_layout_invariance(ray_session):
    base = _result(table_diff(_ds(OLD), _ds(NEW), key_col="k"))
    for nb_old, nb_new in [(3, 1), (1, 4), (5, 5)]:
        got = _result(
            table_diff(_ds(OLD, nb_old), _ds(NEW, nb_new), key_col="k")
        )
        assert got == base


def test_modes_agree_on_random_data(ray_session):
    rng = np.random.default_rng(7)
    n = 2000
    old_k = np.arange(n, dtype=np.int64)
    old = {
        "k": pa.array(old_k, pa.int64()),
        "a": pa.array(rng.integers(0, 5, n), pa.int64()),
        "s": pa.array(
            [None if x == 0 else f"s{x}" for x in rng.integers(0, 3, n)],
            pa.string(),
        ),
    }
    keep = rng.random(n) > 0.1  # ~10% deleted
    new_k = np.concatenate([old_k[keep], np.arange(n, n + 97, dtype=np.int64)])
    nn = new_k.size
    new = {
        "k": pa.array(new_k, pa.int64()),
        "a": pa.array(
            np.where(
                rng.random(nn) < 0.15,
                rng.integers(5, 9, nn),
                np.concatenate(
                    [old["a"].to_numpy()[keep], rng.integers(0, 5, 97)]
                ),
            ),
            pa.int64(),
        ),
        "s": pa.array(
            [None if x == 0 else f"s{x}" for x in rng.integers(0, 3, nn)],
            pa.string(),
        ),
    }
    fp = _result(table_diff(_ds(old, 4), _ds(new, 3), key_col="k"))
    cols = _result(
        table_diff(_ds(old, 4), _ds(new, 3), key_col="k", mode="columns")
    )
    assert fp == cols
    assert any(c == "deleted" for _, c in fp)
    assert sum(c == "added" for _, c in fp) >= 97


@pytest.mark.parametrize("side", ["old", "new"])
def test_duplicate_key_raises(ray_session, side):
    dup = {
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array(["a", "b"], pa.string()),
        "n": pa.array([1, 2], pa.int64()),
    }
    old, new = (dup, NEW) if side == "old" else (OLD, dup)
    with pytest.raises(Exception, match="duplicate key"):
        table_diff(_ds(old), _ds(new), key_col="k").materialize()


def test_float_column_rejected_in_fingerprint_mode(ray_session):
    f_old = {"k": pa.array([1], pa.int64()), "x": pa.array([1.0])}
    f_new = {"k": pa.array([1], pa.int64()), "x": pa.array([2.0])}
    with pytest.raises(ValueError, match="columns"):
        table_diff(_ds(f_old), _ds(f_new), key_col="k")
    got = _result(
        table_diff(_ds(f_old), _ds(f_new), key_col="k", mode="columns")
    )
    assert got == [(1, "changed")]


def test_schema_mismatch_raises(ray_session):
    other = {"k": pa.array([1], pa.int64()), "z": pa.array([1], pa.int64())}
    with pytest.raises(ValueError, match="disagree"):
        table_diff(_ds(OLD), _ds(other), key_col="k")


def test_empty_sides(ray_session):
    empty = {c: a.slice(0, 0) for c, a in OLD.items()}
    all_added = _result(table_diff(_ds(empty), _ds(OLD), key_col="k"))
    assert all_added == [(k, "added") for k in [1, 2, 3, 4, 5]]
    all_del = _result(table_diff(_ds(OLD), _ds(empty), key_col="k"))
    assert all_del == [(k, "deleted") for k in [1, 2, 3, 4, 5]]
    both = table_diff(_ds(empty), _ds(empty), key_col="k").to_pandas()
    assert len(both) == 0


def test_identical_snapshots_emit_nothing(ray_session):
    got = table_diff(_ds(OLD, 2), _ds(OLD, 3), key_col="k").to_pandas()
    assert len(got) == 0


def test_validation(ray_session):
    with pytest.raises(ValueError, match="mode"):
        table_diff(_ds(OLD), _ds(NEW), key_col="k", mode="nope")
    with pytest.raises(ValueError, match="key column"):
        table_diff(_ds(OLD), _ds(NEW), key_col="missing")
    s_old = {"k": pa.array(["x"], pa.string()), "v": pa.array([1], pa.int64())}
    with pytest.raises(ValueError, match="integral"):
        table_diff(_ds(s_old), _ds(s_old), key_col="k")


# ---------------------------------------------------------------------------
# table_fingerprint


def test_fingerprint_order_and_layout_invariant(ray_session):
    import ray.data

    from deepseek_ocr_ray.state.diff import table_fingerprint

    t = pa.table(
        {
            "a": pa.array([3, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", None, "y", "y"], pa.string()),
        }
    )
    rev = t.take(pa.array([3, 2, 1, 0]))
    for method in ("fast", "md5"):
        f1 = table_fingerprint(
            ray.data.from_arrow(t).repartition(3), ["a", "b"], method=method
        ).to_pylist()[0]
        f2 = table_fingerprint(
            ray.data.from_arrow(rev), ["a", "b"], method=method
        ).to_pylist()[0]
        assert f1 == f2 and f1["n_rows"] == 4
        # a changed row changes the fingerprint
        t3 = t.set_column(0, "a", pa.array([3, 1, 2, 99], pa.int64()))
        f3 = table_fingerprint(
            ray.data.from_arrow(t3), ["a", "b"], method=method
        ).to_pylist()[0]
        assert f3["fingerprint"] != f1["fingerprint"]


def test_fingerprint_counts_multiplicity(ray_session):
    """Duplicate rows are NOT cancelled (sum, not xor): 1×row vs 2×row
    differ."""
    import ray.data

    from deepseek_ocr_ray.state.diff import table_fingerprint

    one = pa.table({"a": pa.array([7], pa.int64())})
    two = pa.table({"a": pa.array([7, 7], pa.int64())})
    f1 = table_fingerprint(ray.data.from_arrow(one), ["a"]).to_pylist()[0]
    f2 = table_fingerprint(ray.data.from_arrow(two), ["a"]).to_pylist()[0]
    assert f1["fingerprint"] != f2["fingerprint"]
    with pytest.raises(ValueError, match="method"):
        table_fingerprint(ray.data.from_arrow(one), ["a"], method="nope")
