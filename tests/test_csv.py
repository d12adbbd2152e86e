"""CSV source/sink: nasty-string round-trip, quarantine semantics, the
empty-vs-null convention, error-col collision, fast-reader typing."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray

from deepseek_ocr_ray.sources.csv import read_csv, read_csv_fast, write_csv

NASTY = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            [
                'line1\nline2 with "quotes" and, commas',
                "unicode: héllo wörld — ✓ 中文",
                "",
                "trailing spaces   ",
            ],
            pa.string(),
        ),
        "score": pa.array([1.5, -2.25, 0.0, 3.0], pa.float64()),
        "flag": pa.array([True, False, True, False], pa.bool_()),
    }
)

SCHEMA = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "score": pa.float64(),
    "flag": pa.bool_(),
}


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)


def test_roundtrip_exact_robust(ray_session, tmp_path):
    d = str(tmp_path / "csv")
    write_csv(ray.data.from_arrow(NASTY).repartition(2), d)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".csv")]
    assert len(files) >= 2  # partitioned: one file per block
    back = _sorted(read_csv(files, SCHEMA).to_pandas())
    want = _sorted(NASTY.to_pandas())
    assert back["error"].isna().all()
    for c in ["doc_id", "text", "score", "flag"]:
        assert back[c].tolist() == want[c].tolist(), c


def test_roundtrip_fast_reader(ray_session, tmp_path):
    d = str(tmp_path / "csvf")
    write_csv(ray.data.from_arrow(NASTY), d)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".csv")]
    back = _sorted(read_csv_fast(files).to_pandas())
    want = _sorted(NASTY.to_pandas())
    assert back["text"].tolist() == want["text"].tolist()
    assert back["doc_id"].tolist() == want["doc_id"].tolist()


def test_quarantine_semantics(ray_session, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write(
            "doc_id,text,score,flag\n"
            "1,ok,2.5,true\n"
            "notanint,bad id,1.0,false\n"  # doc_id uncoercible
            "3,ok2,xx,true\n"              # score uncoercible
            "4,ok3,3.0,maybe\n"            # flag uncoercible
            "5,ok4,,true\n"                # empty non-string -> null
            "6.0,intfloat,1.5,f\n"         # integral float id coerces
        )
    got = read_csv([p], SCHEMA).to_pandas()
    errs = got["error"].tolist()
    assert errs[0] is None
    assert "doc_id" in errs[1]
    assert "score" in errs[2]
    assert "flag" in errs[3]
    assert errs[4] is None and pd.isna(got["score"][4])
    assert errs[5] is None and got["doc_id"][5] == 6 and got["flag"][5] is False
    # quarantined rows keep all data columns null
    assert pd.isna(got["doc_id"][1]) and pd.isna(got["text"][1])
    assert len(got) == 6  # never a dropped record


def test_missing_declared_column_null(ray_session, tmp_path):
    p = str(tmp_path / "m.csv")
    with open(p, "w") as f:
        f.write("doc_id,text\n7,hello\n")
    got = read_csv([p], SCHEMA).to_pandas()
    assert got["doc_id"].tolist() == [7]
    assert pd.isna(got["score"][0]) and pd.isna(got["flag"][0])
    assert got["error"].isna().all()


def test_empty_string_convention(ray_session, tmp_path):
    """Empty field: '' for strings, NULL for non-strings (documented)."""
    p = str(tmp_path / "e.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,score,flag\n1,,,\n")
    got = read_csv([p], SCHEMA).to_pandas()
    assert got["text"][0] == ""
    assert pd.isna(got["score"][0]) and pd.isna(got["flag"][0])


def test_error_col_collision_raises(ray_session):
    with pytest.raises(ValueError, match="collides"):
        read_csv(["/tmp/x.csv"], {"error": pa.string()})


def test_documents_roundtrip_cache_reused(ray_session):
    import time

    from deepseek_ocr_ray.pipelines.curation import (
        CSV_CACHE_ROOT,
        documents_csv_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    t1 = documents_csv_roundtrip(sf)
    tag = sf.strip("/").replace("/", "_")
    marker = os.path.join(CSV_CACHE_ROOT, tag, "_COMPLETE")
    assert os.path.exists(marker)
    m1 = os.path.getmtime(marker)
    time.sleep(0.05)
    t2 = documents_csv_roundtrip(sf)
    assert os.path.getmtime(marker) == m1  # export skipped
    assert t1.equals(t2)
