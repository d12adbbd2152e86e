"""Distributed skyline (Pareto frontier) over two integer criteria.

A row ``(x, y)`` is *dominated* when another row has ``x' <= x`` and
``y' >= y`` with at least one strict inequality (minimize ``x``, maximize
``y``); the skyline is the set of non-dominated rows.  Exact ties on both
criteria are mutually non-dominating, so duplicates survive together —
the same semantics as the ``NOT EXISTS`` dominance oracle.

Plan — the algebraic local-filter reduction:

1. every block drops its locally-dominated rows with one vectorized
   lexsort + prefix-max pass (``local_skyline_mask``) — a row dominated
   inside a block is dominated globally, so the block output is always a
   SUPERSET of that block's contribution to the true skyline;
2. the surviving candidates are collected and the SAME kernel runs once
   over the union.

The collected candidate set is bounded by the sum of per-block skyline
sizes.  That sum is small whenever the true skyline is small (correlated
criteria collapse each block to a handful of rows); when the criteria are
perfectly anti-correlated the true skyline IS the whole input and no
algorithm can return less — the candidate set then equals the answer, not
an intermediate blow-up.  For a 100-TB fact table the per-block pass is
the only full-data scan; only frontier candidates cross the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["local_skyline_mask", "skyline"]


def local_skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the skyline (minimize ``x``, maximize ``y``)
    of integer arrays ``x``/``y`` — one lexsort plus one prefix-max, no
    pairwise loop.

    After sorting by (``x`` asc, ``y`` desc), a row is dominated iff the
    best ``y`` among strictly-smaller-``x`` rows reaches its own ``y``
    (strict-in-x domination) or a same-``x`` row carries a strictly
    greater ``y`` (strict-in-y domination).  Both tests read the per-x
    group maxima, which after this sort are simply each group's first
    element.
    """
    n = x.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, x))
    xs = x[order]
    ys = y[order]
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    np.not_equal(xs[1:], xs[:-1], out=new_x[1:])
    group_max_y = ys[new_x]  # y is desc inside each x-group
    run = np.maximum.accumulate(group_max_y)
    gidx = np.cumsum(new_x) - 1
    # max y over all strictly-smaller-x groups (−inf sentinel for group 0
    # expressed as a "no previous group" mask to stay in integer dtype)
    dominated = np.zeros(n, dtype=bool)
    has_prev = gidx > 0
    prev_max = np.empty(n, dtype=y.dtype)
    prev_max[has_prev] = run[gidx[has_prev] - 1]
    dominated[has_prev] = prev_max[has_prev] >= ys[has_prev]
    dominated |= ys < group_max_y[gidx]
    keep_sorted = ~dominated
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(
    ds: ray.data.Dataset,
    *,
    x_col: str,
    y_col: str,
    carry_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Skyline of ``ds`` minimizing ``x_col`` and maximizing ``y_col``
    (both integer columns; negate a column upstream to flip a direction).
    Returns ``carry_cols + [x_col, y_col]`` for every non-dominated row.
    """
    carry = list(carry_cols or [])
    cols = carry + [x_col, y_col]

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        if batch.num_rows == 0:
            return batch
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        keep = local_skyline_mask(x, y)
        return batch.filter(pa.array(keep))

    from ..cluster import collect_table

    cands = collect_table(ds.map_batches(local, batch_format="pyarrow"))
    if cands is None:
        schema = ds.schema().base_schema
        empty = pa.table(
            {c: pa.array([], schema.field(c).type) for c in cols}
        )
        return ray.data.from_arrow(empty)
    keep = local_skyline_mask(
        cands[x_col].to_numpy(zero_copy_only=False),
        cands[y_col].to_numpy(zero_copy_only=False),
    )
    return ray.data.from_arrow(cands.filter(pa.array(keep)))
