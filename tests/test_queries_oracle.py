"""Pre-validation of the driver's correctness gate: every ``queries()``
entry with an ``oracle_sql()`` twin must match DuckDB on the same parquet
tables — row count, column names, and values (order-insensitive).

This mirrors the driver's comparison (sort columns by name, sort rows,
compare values) at sf0.001 so oracle drift is caught locally before a round
is graded.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.sql(sql).df()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _oracle_keys():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_keys())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    want = _canon(_duck(sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            assert np.allclose(
                g.astype(np.float64), w.astype(np.float64), atol=1e-9, rtol=0
            ), f"{name}.{c} float mismatch"
        else:
            eq = (g == w)
            assert eq.all(), (
                f"{name}.{c} mismatch at rows {np.nonzero(~eq)[0][:5]}: "
                f"got {g[~eq][:5]} want {w[~eq][:5]}"
            )


def test_rows_only_queries_run(ray_session):
    """Queries without an oracle still must run and return ≥0 stable rows."""
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) == 200
    assert "doc_id" in df.columns
