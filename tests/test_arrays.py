"""arrays.py — Arrow list→matrix conversion edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_ray.arrays import ints_to_numpy, list_to_matrix


def test_list_to_matrix_basic_and_dtype():
    col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float64()))
    m = list_to_matrix(col, np.float32)
    assert m.shape == (3, 2) and m.dtype == np.float32
    assert m.tolist() == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]


def test_list_to_matrix_sliced_array_respects_offsets():
    col = pa.array([[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))
    sliced = col.slice(1, 2)  # .values would still see the [9, 9] row
    m = list_to_matrix(sliced, np.float32)
    assert m.tolist() == [[1.0, 2.0], [3.0, 4.0]]


def test_list_to_matrix_chunked_and_empty():
    ch = pa.chunked_array(
        [pa.array([[1.0]], pa.list_(pa.float32())),
         pa.array([[2.0]], pa.list_(pa.float32()))]
    )
    assert list_to_matrix(ch).tolist() == [[1.0], [2.0]]
    assert list_to_matrix(pa.array([], pa.list_(pa.float32()))).shape == (0, 0)


def test_list_to_matrix_rejects_ragged_and_nulls():
    with pytest.raises(ValueError, match="ragged"):
        list_to_matrix(pa.array([[1.0], [1.0, 2.0]], pa.list_(pa.float32())))
    with pytest.raises(ValueError, match="null"):
        list_to_matrix(pa.array([[1.0], None], pa.list_(pa.float32())))


def test_ints_to_numpy_chunked():
    ch = pa.chunked_array([pa.array([1, 2], pa.int32()), pa.array([3], pa.int32())])
    out = ints_to_numpy(ch)
    assert out.dtype == np.int64 and out.tolist() == [1, 2, 3]


def test_list_to_matrix_rejects_element_nulls():
    with pytest.raises(ValueError, match="null element"):
        list_to_matrix(pa.array([[1.0, None]], pa.list_(pa.float32())))


def test_ints_to_numpy_rejects_nulls():
    with pytest.raises(ValueError, match="nulls"):
        ints_to_numpy(pa.array([1, None], pa.int64()))


def test_brute_pairs_float32_dtype_no_readonly_crash(ray_session):
    import ray.data

    from deepseek_ocr_ray.stages.dedup import embedding_dup_pairs_brute

    tab = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]], pa.list_(pa.float32())
        ),
    })
    # dtype=float32 matches storage → list_to_matrix returns a read-only
    # zero-copy view; the normalize must not mutate it in place
    out = embedding_dup_pairs_brute(
        ray.data.from_arrow(tab), threshold=0.9, dtype=__import__("numpy").float32
    ).take_all()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
