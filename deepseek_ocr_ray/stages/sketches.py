"""Mergeable sketches for corpus statistics at 10^12-row scale.

The pattern every sketch here follows: each ``map_batches`` task reduces its
block to a tiny fixed-size partial state (registers, counters), the partials
ride one narrow exchange, and a single associative merge produces the
answer — no row-level shuffle ever happens.  Hashing is the engine's
vectorized ``hash64_array`` (integer mix / polynomial string hash, pure
integer arithmetic — no per-row Python), deterministic across processes,
machines, and parallelism levels (merges are element-wise max —
order-independent).

- **HyperLogLog** distinct-count (Flajolet et al. 2007): 2^p byte registers,
  standard bias-corrected estimator with the small-range (linear counting)
  correction; the 32-bit large-range correction is deliberately omitted —
  it is wrong for 64-bit hashes (see ``hll_estimate``).  p=12 → 4 KiB
  state, ~1.6% typical error.
- **exact_distinct** — the oracled exact companion (map-side distinct per
  block, then a distinct-count aggregate; shuffle carries one row per
  distinct value per block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import hash64_array


def _hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hashes of a column or Python list."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values)
    return hash64_array(values)


def hll_partial(values, p: int = 12) -> np.ndarray:
    """Block → HLL registers (uint8[2^p]).  ``values``: column or list."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits + 1, capped at 64-p+1
    mask = np.uint64(1) << np.uint64(63)
    rank = np.ones(len(h), dtype=np.uint8)
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p):
        zero_top = alive & ((rem & mask) == 0)
        rank[zero_top] += 1
        alive &= zero_top
        rem = rem << np.uint64(1)
        if not alive.any():
            break
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL cardinality estimate."""
    m = float(len(regs))
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m >= 64:
        alpha = 0.709
    elif m >= 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting, small range
    # NOTE: no large-range correction.  The classic -2^32*ln(1-est/2^32)
    # branch belongs to the 32-bit-hash formulation; with 64-bit hashes the
    # collision regime it corrects for starts near 2^64, unreachable in
    # practice — applying it at ~143M distinct would inflate estimates and
    # NaN past 2^32 (it was exactly the 10^12-row regime this module
    # targets that would have hit it).
    return int(round(est))


def hll_distinct(
    ds: ray.data.Dataset, col: str, *, p: int = 12
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT col): per-block registers → one merge.

    Driver/exchange volume is 2^p bytes per BLOCK (4 KiB at p=12),
    independent of corpus size; the merge is associative and
    order-independent, so the estimate is identical at any parallelism."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[col], p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def _merge_blobs(batch: pa.Table) -> np.ndarray:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in batch["regs"].to_pylist():
            merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
        return merged

    def combine(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"regs": pa.array([_merge_blobs(batch).tobytes()], pa.binary())}
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "approx_distinct": pa.array(
                    [hll_estimate(_merge_blobs(batch))], pa.int64()
                )
            }
        )

    # tree combine: per-task partial merge, then one final task
    return (
        partials.repartition(8)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def exact_distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT col) — the oracled companion.  Per-block
    distinct first (C++ group_by), so the exchange carries one row per
    distinct value per block, then a global distinct + count."""

    def local(batch: pa.Table) -> pa.Table:
        g = batch.group_by(col).aggregate([])
        return g

    distinct = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(col)
        .count()
    )

    def count_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n_distinct": pa.array([batch.num_rows], pa.int64())}
        )

    def total(batch: pa.Table) -> pa.Table:
        s = pc.sum(batch["n_distinct"]).as_py() or 0
        return pa.table({"n_distinct": pa.array([s], pa.int64())})

    return (
        distinct.map_batches(count_rows, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(total, batch_format="pyarrow", batch_size=None)
    )
