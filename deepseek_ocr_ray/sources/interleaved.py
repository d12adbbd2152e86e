"""Readers for the interleaved document table.

Production system-of-record is a Lance table (north rule); this sandbox has
no ``lance`` package, so the reader prefers ``ray.data.read_lance`` when the
dependency exists and falls back to Parquet with the identical schema.  The
checkpointable layout is one directory per hash partition
(``part={pid}/data.parquet``) — see ``schema.write_interleaved``.
"""

from __future__ import annotations

import glob
import os

import ray.data

from ..schema import synthesize_interleaved


def read_interleaved(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an interleaved doc table from a Lance or Parquet location."""
    if os.path.isdir(path) and glob.glob(os.path.join(path, "**/*.lance"), recursive=True):
        try:
            import lance  # noqa: F401

            return ray.data.read_lance(path, columns=columns)
        except ImportError:
            pass
    return ray.data.read_parquet(path, columns=columns)


def read_partition(root: str, pid: int) -> ray.data.Dataset:
    """Read one hash partition of a ``part={pid}/`` laid-out corpus."""
    return read_interleaved(os.path.join(root, f"part={pid}"))


def list_partitions(root: str) -> list[int]:
    pids = []
    for d in glob.glob(os.path.join(root, "part=*")):
        try:
            pids.append(int(os.path.basename(d).split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(pids)


def synthetic_dataset(n_docs: int, seed: int = 42, parallelism: int = -1) -> ray.data.Dataset:
    """In-memory deterministic corpus as a Dataset (tests / small runs).

    Generation is distributed: ``range(n_docs)`` → ``map_batches(gen)`` so
    large synthetic corpora never materialize on the driver.
    """
    import pyarrow as pa

    from ..schema import IN_SCHEMA, gen_doc

    def gen(batch: pa.Table) -> pa.Table:
        rows = [gen_doc(int(i), seed) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=IN_SCHEMA)

    kwargs = {}
    if parallelism > 0:
        kwargs["override_num_blocks"] = parallelism
    # batch_size=None → one batch per input block: keeps the generator as
    # wide as ray.data.range's partitioning (a fixed batch_size here would
    # coalesce blocks and cap downstream parallelism)
    return ray.data.range(n_docs, **kwargs).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


def synthetic_table(n_docs: int, seed: int = 42):
    """Driver-side small corpus (unit tests)."""
    return synthesize_interleaved(n_docs, seed)
