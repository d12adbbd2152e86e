"""Relational set operations (stages/setops.py) — DuckDB differential,
block invariance, and edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.stages.setops import set_op


def _tab(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "k": pa.array(rng.randint(0, 400, n).tolist(), pa.int64()),
            "s": pa.array([f"s{v}" for v in rng.randint(0, 5, n)], pa.string()),
        }
    )


def _collect(ds) -> set[tuple]:
    t = ds.take_all()
    return {(r["k"], r["s"]) for r in t}


def _sql(left: pa.Table, right: pa.Table, op: str) -> set[tuple]:
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    rows = con.execute(
        f"SELECT k, s FROM l {op} SELECT k, s FROM r"
    ).fetchall()
    return set(rows)


@pytest.mark.parametrize("how,op", [
    ("except", "EXCEPT"),
    ("intersect", "INTERSECT"),
    ("union", "UNION"),
])
@pytest.mark.parametrize("seeds", [(1, 2), (7, 7), (11, 13)])
def test_set_op_vs_duckdb(ray_session, how, op, seeds):
    import ray.data

    left, right = _tab(seeds[0]), _tab(seeds[1])
    got = _collect(
        set_op(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            ["k", "s"],
            how,
        )
    )
    assert got == _sql(left, right, op)


def test_set_op_block_invariance(ray_session):
    import ray.data

    left, right = _tab(3), _tab(4)
    outs = [
        _collect(
            set_op(
                ray.data.from_arrow(left).repartition(nb),
                ray.data.from_arrow(right).repartition(nb),
                ["k", "s"],
                "except",
            )
        )
        for nb in (1, 7)
    ]
    assert outs[0] == outs[1]


def test_set_op_disjoint_and_empty(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "s": pa.array(["a", "b"])})
    right = pa.table({"k": pa.array([9], pa.int64()), "s": pa.array(["z"])})
    l, r = ray.data.from_arrow(left), ray.data.from_arrow(right)
    assert _collect(set_op(l, r, ["k", "s"], "intersect")) == set()
    assert _collect(set_op(l, r, ["k", "s"], "except")) == {(1, "a"), (2, "b")}
    assert _collect(set_op(l, r, ["k", "s"], "union")) == {
        (1, "a"), (2, "b"), (9, "z")
    }


def test_set_op_rejects_bad_args(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_tab(1))
    with pytest.raises(ValueError, match="how="):
        set_op(ds, ds, ["k"], "minus")
    with pytest.raises(ValueError, match="non-empty"):
        set_op(ds, ds, [], "except")


def test_set_op_casts_right_key_types_to_left(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "s": pa.array(["a", "b", "c"])})
    right = pa.table({"k": pa.array([2, 9], pa.int32()),  # narrower type
                      "s": pa.array(["b", "z"])})
    got = _collect(
        set_op(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            ["k", "s"], "except",
        )
    )
    assert got == {(1, "a"), (3, "c")}


# --- algebraic identities (hypothesis) ---

from hypothesis import given, settings, strategies as st

_keys = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=60,
)


def _as_tab(rows):
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.string()),
    })


@settings(max_examples=8, deadline=None)
@given(_keys, _keys)
def test_set_op_identities(ray_session, lrows, rrows):
    """EXCEPT ⊎ INTERSECT partitions distinct(L); UNION = set(L) ∪ set(R)."""
    import ray.data

    l, r = _as_tab(lrows), _as_tab(rrows)
    ld = ray.data.from_arrow(l).repartition(2)
    rd = ray.data.from_arrow(r).repartition(3)
    exc = _collect(set_op(ld, rd, ["k", "s"], "except"))
    inter = _collect(set_op(ld, rd, ["k", "s"], "intersect"))
    uni = _collect(set_op(ld, rd, ["k", "s"], "union"))
    lset, rset = set(lrows), set(rrows)
    assert exc | inter == lset and not (exc & inter)
    assert inter == lset & rset  # pins intersect against the RIGHT side too
    assert uni == lset | rset
