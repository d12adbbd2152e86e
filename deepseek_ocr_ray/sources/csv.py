"""CSV source/sink — the fourth interchange format beside parquet, Lance
and JSONL (``sources/jsonl.py``).

Same contract shape as the JSONL pair:

* :func:`write_csv` — partitioned sink, one UTF-8 ``.csv`` file per block
  (Arrow's writer quotes embedded newlines/quotes/commas, so nasty
  strings round-trip);
* :func:`read_csv_fast` — trusted-data scan through Arrow's C++ CSV
  parser (whole-file parse per task, so QUOTED newlines are safe — a
  byte-range line split would tear them);
* :func:`read_csv` — the robust path: every cell parses as a string
  first, then a vectorized-per-block coerce stage applies the declared
  schema with QUARANTINE semantics (an uncoercible field becomes an
  error-column row, never a dropped record — the S7 upload-loader
  convention shared with ``read_jsonl``).  Missing declared columns read
  as null; undeclared columns are ignored.

CSV's format limitation, stated rather than papered over: an EMPTY field
is ambiguous between ``NULL`` and ``""``.  This module resolves it the
Arrow way — empty → null for NON-string declared types, empty → ``""``
for string types — which makes string columns round-trip exactly (our
sink writes ``""`` for both) but maps a null string to ``""`` on the way
back.  Pipelines that must distinguish them should use JSONL or parquet.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["read_csv", "read_csv_fast", "write_csv"]


def write_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned CSV sink — one UTF-8 ``.csv`` file per block (header
    row per file; embedded newlines/quotes quoted by Arrow's writer).
    Consumes the stream; blocks until written."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_csv(out_dir)


def read_csv_fast(paths: str | list[str], **read_args: Any) -> ray.data.Dataset:
    """Clean-data CSV scan via Arrow's C++ parser (loud on malformed
    input; types inferred unless ``convert_options`` pins them).
    ``read_args`` pass through to ``ray.data.read_csv``."""
    return ray.data.read_csv(paths, **read_args)


def _coerce_cell(raw: str | None, typ: pa.DataType) -> Any:
    """One CSV cell (already a string or null) → the declared type;
    raises ``ValueError`` on anything lossy (the caller quarantines)."""
    if raw is None:
        return None
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return raw
    if raw == "":
        return None  # the CSV empty-field convention (module docstring)
    if pa.types.is_integer(typ):
        try:
            return int(raw)
        except ValueError:
            f = float(raw)  # "3.0" is an integral float: coerce
            if f.is_integer():
                return int(f)
            raise ValueError(f"not an integer: {raw!r}")
    if pa.types.is_floating(typ):
        return float(raw)
    if pa.types.is_boolean(typ):
        low = raw.strip().lower()
        if low in ("true", "1", "t"):
            return True
        if low in ("false", "0", "f"):
            return False
        raise ValueError(f"not a bool: {raw!r}")
    raise ValueError(f"unsupported declared type {typ}")


def read_csv(
    paths: str | list[str],
    schema: dict[str, pa.DataType],
    *,
    error_col: str = "error",
    **read_args: Any,
) -> ray.data.Dataset:
    """Robust CSV scan: quarantine semantics against a declared schema.

    Returns the ``schema`` columns plus ``error_col`` (string, null for
    clean rows).  A field that fails coercion yields a row with all data
    columns null and ``error_col`` = ``"<col>: <reason>"`` — never a
    dropped record.  Structurally broken FILES (ragged rows the C++
    parser rejects) still raise: CSV carries no row framing to recover
    with, unlike JSONL's line framing.
    """
    from pyarrow import csv as pa_csv

    if error_col in schema:
        raise ValueError(
            f"error_col {error_col!r} collides with a schema column"
        )
    cols = list(schema.items())
    # parse EVERYTHING as string first; declared columns only
    convert = pa_csv.ConvertOptions(
        column_types={name: pa.string() for name in schema},
        strings_can_be_null=False,
        include_columns=list(schema),
        include_missing_columns=True,
    )

    def coerce(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        raws = {
            name: (
                batch[name].to_pylist()
                if name in batch.column_names
                else [None] * n
            )
            for name, _ in cols
        }
        out: dict[str, list] = {name: [None] * n for name, _ in cols}
        errs: list[str | None] = [None] * n
        for i in range(n):
            vals: dict[str, Any] = {}
            err = None
            for name, typ in cols:
                try:
                    vals[name] = _coerce_cell(raws[name][i], typ)
                except ValueError as e:
                    err = f"{name}: {e}"
                    vals = {}
                    break
            if err is None:
                for name, _ in cols:
                    out[name][i] = vals[name]
            errs[i] = err
        arrs = {name: pa.array(out[name], typ) for name, typ in cols}
        arrs[error_col] = pa.array(errs, pa.string())
        return pa.table(arrs)

    return ray.data.read_csv(
        paths, convert_options=convert, **read_args
    ).map_batches(coerce, batch_format="pyarrow")
