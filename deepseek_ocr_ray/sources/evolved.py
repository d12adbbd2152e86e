"""Schema-evolution parquet reader — one aligned Dataset over files
written across schema generations.

A lake accumulating for years has files whose schemas drifted: columns
added, widened, dropped.  A plain ``read_parquet`` over the mix takes
the first file's schema and breaks on the rest.  This reader does what
warehouses call ``union_by_name``:

1. a DISTRIBUTED footer sweep (the ``state/zonemap.py`` convention — the
   file list streams through ``map_batches`` tasks; only metadata pages
   move) fingerprints every file's serialized schema;
2. files group by schema version — years of drift produce a handful of
   versions, so the driver sees one row per FILE but one read per
   VERSION;
3. each version reads once (one ``read_parquet`` over that version's
   file list) through an align stage: declared columns missing from the
   version materialize as typed nulls, present-but-narrower columns cast
   (Arrow ``safe`` casts — a lossy cast raises loudly), undeclared
   columns drop;
4. the per-version datasets union into one stream with exactly the
   declared schema.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..cluster import arrow_block_refs

__all__ = ["read_parquet_evolved", "schema_versions"]


def _sweep_schemas(paths: list[str]) -> list[tuple[str, str]]:
    """(path, schema_fingerprint) per file via a distributed footer
    sweep; returns driver-side (one tiny row per file)."""
    import ray as _ray

    if not paths:
        raise ValueError("no input files")

    def probe(batch: pa.Table) -> pa.Table:
        ps = batch["path"].to_pylist()
        fps = []
        for p in ps:
            sch = pq.read_schema(p)
            fps.append(
                hashlib.md5(sch.serialize().to_pybytes()).hexdigest()
            )
        return pa.table(
            {"path": pa.array(ps, pa.string()), "fp": pa.array(fps, pa.string())}
        )

    listing = ray.data.from_arrow(
        pa.table({"path": pa.array(sorted(paths), pa.string())})
    )
    parts = _ray.get(
        arrow_block_refs(
        listing.map_batches(probe, batch_format="pyarrow")
    )
    )
    out: list[tuple[str, str]] = []
    for t in parts:
        if "path" in t.column_names:
            out.extend(zip(t["path"].to_pylist(), t["fp"].to_pylist()))
    return out


def schema_versions(paths: list[str]) -> dict[str, list[str]]:
    """Group files by schema fingerprint (footer sweep only)."""
    groups: dict[str, list[str]] = {}
    for p, fp in _sweep_schemas(paths):
        groups.setdefault(fp, []).append(p)
    return groups


def read_parquet_evolved(
    paths: list[str],
    schema: dict[str, pa.DataType],
    *,
    max_versions: int = 64,
    **read_args,
) -> ray.data.Dataset:
    """Union-by-name read: one Dataset with exactly the declared
    ``schema`` columns over files of ANY schema generation."""
    if not schema:
        raise ValueError("declare at least one column")
    groups = schema_versions(paths)
    if len(groups) > max_versions:
        raise ValueError(
            f"{len(groups)} distinct file schemas (> max_versions="
            f"{max_versions}) — that is not drift, that is a corrupted "
            "layout; inspect schema_versions() output"
        )
    cols = list(schema.items())

    def make_align(version_names: list[str]):
        def align(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = {}
            for name, typ in cols:
                if name in batch.column_names:
                    out[name] = batch[name].cast(typ)  # safe: raises if lossy
                else:
                    out[name] = pa.nulls(n, typ)
            return pa.table(out)

        return align

    parts: list[ray.data.Dataset] = []
    for fp in sorted(groups):
        files = groups[fp]
        names = pq.read_schema(files[0]).names
        d = ray.data.read_parquet(files, **read_args).map_batches(
            make_align(names), batch_format="pyarrow"
        )
        parts.append(d)
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out
