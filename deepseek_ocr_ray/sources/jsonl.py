"""JSONL source / sink.

Training-data pipelines interchange corpora as newline-delimited JSON at
least as often as Parquet, so the engine reads it two ways and writes it
one way:

- :func:`read_jsonl_fast` — the clean-data path: ``ray.data.read_json``
  (pyarrow's streaming block parser, C++ end to end).  Fails loudly on a
  malformed line or a type conflict — use it when the producer is
  trusted (e.g. our own :func:`write_jsonl` output).
- :func:`read_jsonl` — the ROBUST path for third-party dumps: lines
  stream through ``ray.data.read_text`` (parallel by file / byte range)
  and parse against a caller-declared schema with QUARANTINE semantics —
  a malformed line or an uncoercible field becomes a row with the data
  columns null and the raw line + reason in the ``error`` column, never
  a dropped record and never a job failure.  This mirrors the upload
  loader's quarantine convention (stages/model_stub.py, SURVEY §2 S7;
  ref behavior: gradio upload paths skip unreadable files silently — we
  keep them visible instead).  Missing fields are null, unknown fields
  are ignored, integral floats coerce to declared int columns.
- :func:`write_jsonl` — ``Dataset.write_json``: one ``.json`` file per
  block (UTF-8, escaped newlines), so output is partitioned and a
  re-run can resume per file.

Scale notes: the robust parse is necessarily per-record Python
(``json.loads`` has no vectorized form) — it is a stateless task map
that scales with cores and is the ingest boundary, not a hot analytic
path; everything downstream is Arrow.  ``read_text`` splits large files
by byte ranges, so a single giant ``.jsonl`` still parallelizes.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import ray.data

__all__ = ["read_jsonl", "read_jsonl_fast", "write_jsonl"]


def read_jsonl_fast(paths: str | list[str], **read_args: Any) -> ray.data.Dataset:
    """Clean-data JSONL scan via pyarrow's block parser (C++; loud on
    malformed input).  ``read_args`` pass through to
    ``ray.data.read_json`` (e.g. ``override_num_blocks``)."""
    return ray.data.read_json(paths, **read_args)


def _coerce(value: Any, typ: pa.DataType) -> Any:
    """Coerce one parsed-JSON value to the declared Arrow type; raise
    ``ValueError`` on anything lossy or mistyped (the caller quarantines).
    ``None`` always passes through as null."""
    if value is None:
        return None
    if pa.types.is_integer(typ):
        if isinstance(value, bool):
            raise ValueError(f"bool where integer declared: {value!r}")
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        raise ValueError(f"not an integer: {value!r}")
    if pa.types.is_floating(typ):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(f"not a number: {value!r}")
        return float(value)
    if pa.types.is_boolean(typ):
        if not isinstance(value, bool):
            raise ValueError(f"not a bool: {value!r}")
        return value
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        if not isinstance(value, str):
            raise ValueError(f"not a string: {value!r}")
        return value
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        if not isinstance(value, list):
            raise ValueError(f"not a list: {value!r}")
        vt = typ.value_type
        return [_coerce(v, vt) for v in value]
    raise ValueError(f"unsupported declared type {typ}")


def read_jsonl(
    paths: str | list[str],
    schema: dict[str, pa.DataType],
    *,
    error_col: str = "error",
    **read_args: Any,
) -> ray.data.Dataset:
    """Robust JSONL scan: quarantine semantics against a declared schema.

    Returns a Dataset with the ``schema`` columns plus ``error_col``
    (string, null for clean rows).  A malformed line, a non-object
    record, or a field that fails coercion yields a row with all data
    columns null and ``error_col`` = ``"<reason>: <raw line prefix>"``.
    """
    if error_col in schema:
        raise ValueError(f"error_col {error_col!r} collides with a schema column")
    cols = list(schema.items())

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pylist()
        out: dict[str, list] = {name: [] for name, _ in cols}
        errs: list[str | None] = []
        for line in lines:
            if not line or line.isspace():
                continue
            err = None
            vals: dict[str, Any] = {}
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError(f"record is {type(rec).__name__}, not object")
                for name, typ in cols:
                    vals[name] = _coerce(rec.get(name), typ)
            except (ValueError, json.JSONDecodeError) as e:
                err = f"{e}: {line[:120]}"
                vals = {}
            for name, _ in cols:
                out[name].append(vals.get(name))
            errs.append(err)
        arrs = {name: pa.array(out[name], typ) for name, typ in cols}
        arrs[error_col] = pa.array(errs, pa.string())
        return pa.table(arrs)

    return ray.data.read_text(paths, **read_args).map_batches(
        parse, batch_format="pyarrow"
    )


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned JSONL sink — one UTF-8 ``.json`` file per block
    (embedded newlines/quotes JSON-escaped; verified round-trip-exact in
    tests).  Consumes the stream; blocks until written."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
