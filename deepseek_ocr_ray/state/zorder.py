"""Z-order (Morton) clustering — multi-column data skipping.

The third member of the skipping family: the zone map prunes range scans
on the ONE column the layout is sorted by, the Bloom index prunes point
lookups, and Z-ORDER makes the zone map work on SEVERAL columns at once
— the Databricks ``OPTIMIZE ZORDER BY`` shape.  Each row's columns
quantize into fixed-width bins and bit-interleave into one Morton key;
sorting by that key gives every output file a small SUBCUBE of the
value space, so per-file [min,max] is tight on EVERY interleaved column
and the plain zone map prunes range scans on any of them.

:func:`zorder_write` is the clustering write: one cheap min/max pass
(per-block partials, driver merge), one streaming key pass, ONE sort
exchange (inherent — clustering IS a global reorder), an order-preserving
``repartition`` to the target file count (coalesce/split, no shuffle),
and an atomic landing with a manifest.  ``build_zonemap`` over the
result serves the scans; correctness never depends on the pruning — the
residual predicate always applies (the zonemap contract).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data

from ..cluster import arrow_block_refs

__all__ = ["zorder_key", "zorder_write"]

_MARKER = "_ZORDER.json"


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of x to the even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def zorder_key(
    cols: list[np.ndarray],
    los: list[int],
    his: list[int],
    *,
    bits: int = 16,
) -> np.ndarray:
    """Morton key for 2 columns: each quantizes linearly into
    ``2**bits`` bins over its [lo, hi] and the bins bit-interleave."""
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    if not 1 <= bits <= 32:
        raise ValueError("bits must be in [1, 32]")
    top = (1 << bits) - 1
    qs = []
    for v, lo, hi in zip(cols, los, his):
        span = max(int(hi) - int(lo), 1)
        q = (v.astype(np.int64) - int(lo)).clip(0) * top // span
        qs.append(np.clip(q, 0, top).astype(np.uint64))
    return (_part1by1(qs[0]) | (_part1by1(qs[1]) << np.uint64(1))).astype(
        np.int64
    )


def zorder_write(
    ds: ray.data.Dataset,
    cols: list[str],
    out_dir: str,
    *,
    n_files: int = 32,
    bits: int = 16,
) -> str:
    """Cluster ``ds`` by the Morton order of ``cols`` (exactly 2 integer
    columns) into ``n_files`` parquet files at ``out_dir`` (atomic
    replace; idempotence is the CALLER's completion-marker concern, as
    with the other cached layouts).  Returns ``out_dir``."""
    import ray as _ray

    if len(cols) != 2:
        raise ValueError("zorder_write clusters exactly 2 columns")
    schema = ds.schema().base_schema
    for c in cols:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
        if not pa.types.is_integer(schema.field(c).type):
            raise ValueError(
                f"column {c!r} must be integer (got "
                f"{schema.field(c).type}) — quantize first"
            )

    def bounds(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = batch[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
            out[f"{c}_lo"] = pa.array(
                [int(v.min()) if v.size else None], pa.int64()
            )
            out[f"{c}_hi"] = pa.array(
                [int(v.max()) if v.size else None], pa.int64()
            )
        return pa.table(out)

    parts = [
        t
        for t in _ray.get(
            arrow_block_refs(
            ds.map_batches(bounds, batch_format="pyarrow")
        )
        )
        if f"{cols[0]}_lo" in t.column_names and t.num_rows
    ]
    if not parts:
        raise ValueError("cannot z-order an empty dataset")
    merged = pa.concat_tables(parts, promote_options="default")
    los = [
        min(x for x in merged[f"{c}_lo"].to_pylist() if x is not None)
        for c in cols
    ]
    his = [
        max(x for x in merged[f"{c}_hi"].to_pylist() if x is not None)
        for c in cols
    ]

    def add_key(batch: pa.Table) -> pa.Table:
        arrs = [
            batch[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
            for c in cols
        ]
        z = zorder_key(arrs, los, his, bits=bits)
        return batch.append_column("_z", pa.array(z, pa.int64()))

    clustered = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .sort("_z")
        .repartition(int(n_files))
        .drop_columns(["_z"])
    )
    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    clustered.write_parquet(tmp)
    with open(os.path.join(tmp, _MARKER), "w") as f:
        json.dump({"cols": cols, "bits": bits, "lo": los, "hi": his}, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir
