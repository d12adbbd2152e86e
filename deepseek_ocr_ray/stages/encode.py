"""Categorical feature encoding — sorted-vocabulary dictionary encode.

The feature-engineering twin of ``agg.group_standardize``: map each string
column to its dense integer index in the column's SORTED distinct
vocabulary (the deterministic equivalent of sklearn's OrdinalEncoder /
a feature-store dictionary encode).  Sorted order makes the index a pure
function of the value set — independent of row order, block layout and
parallelism — and matches SQL's
``ROW_NUMBER() OVER (ORDER BY v) - 1`` over ``SELECT DISTINCT``
(UTF-8 byte order == code-point order for valid UTF-8, so Arrow, numpy
and DuckDB binary collation all agree).

Plan — two streaming scans, no row-level exchange:

1. vocab pass: every block reduces to its per-column distinct values
   (``pc.unique`` — C++), so the collected volume is
   O(blocks × per-block distinct), bounded by blocks × vocab; the driver
   de-duplicates and sorts once per column.  A vocabulary past
   ``max_vocab`` raises loudly — unbounded domains want a hash feature
   (``curation.dsir_scores``-style) or a join encode, not a broadcast;
2. encode pass: the sorted vocab arrays broadcast once via ``ray.put``
   and each block probes them with ``pc.index_in`` (C++ hash probe).
   NULL input stays NULL index.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..cluster import arrow_block_refs

__all__ = ["categorical_encode"]


def categorical_encode(
    ds: ray.data.Dataset,
    cols: list[str],
    *,
    suffix: str = "_idx",
    max_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Append ``<col><suffix>`` int64 dense-rank columns for each string
    column in ``cols`` (index = position in the column's sorted distinct
    non-null vocabulary; NULL in → NULL index out)."""
    import ray as _ray

    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("categorical_encode requires an Arrow-block dataset")
    for c in cols:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
        t = schema.field(c).type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise ValueError(
                f"column {c!r} must be string (got {t}) — integers are "
                "already ordinal"
            )
        if f"{c}{suffix}" in schema.names:
            raise ValueError(f"output column {c}{suffix!r} already exists")

    def blk_vocab(batch: pa.Table) -> pa.Table:
        ids, vals = [], []
        for i, c in enumerate(cols):
            u = pc.drop_null(pc.unique(batch[c].combine_chunks()))
            ids.append(pa.array([i] * len(u), pa.int32()))
            vals.append(u.cast(pa.large_string()))
        return pa.table(
            {
                "_col": pa.concat_arrays(ids),
                "_val": pa.concat_arrays([v for v in vals]),
            }
        )

    parts = _ray.get(
        arrow_block_refs(
            ds.map_batches(blk_vocab, batch_format="pyarrow")
        )
    )
    merged = pa.concat_tables(parts, promote_options="default")
    vocabs: list[pa.Array] = []
    for i, c in enumerate(cols):
        vals = merged.filter(pc.equal(merged["_col"], i))["_val"]
        vocab = pc.unique(vals.combine_chunks())
        if len(vocab) > max_vocab:
            raise ValueError(
                f"categorical_encode: column {c!r} has {len(vocab)} distinct "
                f"values (> max_vocab={max_vocab}) — use a hashed feature or "
                "a join encode for unbounded domains"
            )
        vocabs.append(vocab.take(pc.array_sort_indices(vocab)))
    vocab_ref = _ray.put(vocabs)

    def encode(batch: pa.Table) -> pa.Table:
        vs = _ray.get(vocab_ref)
        out = batch
        for i, c in enumerate(cols):
            idx = pc.index_in(
                batch[c].cast(pa.large_string()), value_set=vs[i]
            ).cast(pa.int64())
            out = out.append_column(f"{c}{suffix}", idx)
        return out

    return ds.map_batches(encode, batch_format="pyarrow")


def target_encode(
    ds: ray.data.Dataset,
    keys: list[str],
    target_col: str,
    *,
    out_col: str = "te",
    loo: bool = True,
    max_groups: int = 2_000_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Leave-one-out target encoding — the supervised sibling of
    :func:`categorical_encode`: each row gets its category's mean target
    EXCLUDING the row itself (``(Σv_g − v) / (n_g − 1)``), the classic
    leakage-safe categorical feature.  ``loo=False`` gives the plain
    category mean ``Σv_g / n_g``.

    Exactness contract: the target must be integer (quantize per the
    engine convention); group sums ride exact int64 (the wrap-free
    ``n·max|v| ≤ I64_SAFE`` honesty check, as in ``group_standardize``),
    and the per-row finish is ONE pinned float division —
    ``double(Σv − v) / double(n − 1)`` — that DuckDB replicates
    term-for-term (HUGEINT-minus cast to DOUBLE is correctly rounded, as
    is int64→double).  Singleton groups (n=1) have no leave-one-out mean:
    NULL out.

    Plan: the moments pass reduces to one (n, Σv, max|v|) row per group
    via the C++ bucket aggregate; the reduced table collects to the
    driver (capped — unbounded domains want the join encode), and the
    (n, s) vectors broadcast once via collision-checked hash64 for the
    searchsorted probe in the encode pass.  Two streaming scans, zero
    row-level exchange.
    """
    import numpy as np

    import ray as _ray

    from ..hashing import hash64_columns
    from .agg import _I64_SAFE, bucket_groupby_agg

    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("target_encode requires an Arrow-block dataset")
    for c in [*keys, target_col]:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
    if out_col in schema.names:
        raise ValueError(f"output column {out_col!r} already exists")
    if not pa.types.is_integer(schema.field(target_col).type):
        raise ValueError(
            f"{target_col!r} must be integer (got "
            f"{schema.field(target_col).type}) — quantize floats to "
            "cents/ppm per the engine convention"
        )

    def derive(batch: pa.Table) -> pa.Table:
        col = batch[target_col]
        if col.null_count:
            raise ValueError(
                f"target_encode: {target_col!r} contains nulls — filter or "
                "impute the target first"
            )
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                **{k: batch[k] for k in keys},
                "_v": pa.array(v, pa.int64()),
                "_av": pa.array(np.abs(v), pa.int64()),
            }
        )

    stats_ds = bucket_groupby_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys,
        [("_v", "sum", "_s"), (None, "count", "_n"), ("_av", "max", "_m")],
        n_buckets=n_buckets,
    )
    stats = pa.concat_tables(
        _ray.get(arrow_block_refs(stats_ds)), promote_options="default"
    )
    if stats.num_rows > max_groups:
        raise ValueError(
            f"target_encode: {stats.num_rows} groups exceed the driver-side "
            f"cap ({max_groups}) — use a join encode for unbounded domains"
        )
    n_arr = stats["_n"].to_numpy(zero_copy_only=False)
    s_arr = stats["_s"].to_numpy(zero_copy_only=False)
    m_arr = stats["_m"].to_numpy(zero_copy_only=False)
    # wrap-free honesty check: count and max never wrap, so if every
    # group's n·max|v| fits, no Σv partial anywhere could have wrapped
    risk = np.flatnonzero(
        m_arr.astype(object) * n_arr.astype(object) > _I64_SAFE
    )
    if risk.size:
        raise ValueError(
            "target_encode: a group exceeds the int64 Σv horizon "
            f"(n={int(n_arr[risk[0]])}, max|v|={int(m_arr[risk[0]])}) — "
            "rescale the quantization"
        )
    ghash = hash64_columns(stats.select(keys), keys).view(np.int64)
    order = np.argsort(ghash, kind="stable")
    gh_sorted = ghash[order]
    if gh_sorted.size > 1 and (gh_sorted[1:] == gh_sorted[:-1]).any():
        raise ValueError(
            "target_encode: hash64 collision between distinct group keys"
        )
    lookup_ref = _ray.put((gh_sorted, n_arr[order], s_arr[order]))
    use_loo = bool(loo)

    def encode(batch: pa.Table) -> pa.Table:
        gh_s, n_s, s_s = _ray.get(lookup_ref)
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.float64()))
        h = hash64_columns(batch.select(keys), keys).view(np.int64)
        pos = np.searchsorted(gh_s, h)
        np.clip(pos, 0, max(gh_s.size - 1, 0), out=pos)
        # every key is in the vocab by construction; the probe is exact
        v = batch[target_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_g = n_s[pos]
        s_g = s_s[pos]
        if use_loo:
            ok = n_g > 1
            te = np.full(v.size, np.nan, np.float64)
            te[ok] = (s_g[ok] - v[ok]).astype(np.float64) / (
                n_g[ok] - 1
            ).astype(np.float64)
            col = pa.array(te, mask=~ok, type=pa.float64())
        else:
            col = pa.array(
                s_g.astype(np.float64) / n_g.astype(np.float64), pa.float64()
            )
        return batch.append_column(out_col, col)

    return ds.map_batches(encode, batch_format="pyarrow")


def quantile_bin(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    n_bins: int,
    *,
    out_col: str = "bin",
    max_groups: int = 2_000_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Grouped equi-depth discretization — the KBinsDiscretizer of feature
    pipelines: each row's value maps to ``#{i : b_i ≤ v}`` where the
    ``b_i`` are the group's EXACT discrete quantiles at
    ``i/n_bins, i = 1..n_bins−1`` (DuckDB ``quantile_disc`` convention).
    Counting bounds ≤ v (instead of SQL ``NTILE``, whose tie assignment is
    row-order-dependent) makes the bin a pure function of (value, group
    value multiset): equal values always share a bin, and results are
    layout/parallelism invariant.  Bins range 0..n_bins−1; skewed groups
    may leave some bins empty — that is the well-defined answer, not an
    error.

    Plan: the bounds come out of ONE histogram exchange
    (:func:`agg.group_quantiles_disc` — all n_bins−1 ranks walk the same
    sorted per-group histogram), collect driver-side (capped), broadcast
    as a (groups × n_bins−1) matrix keyed by collision-checked hash64,
    and the assign pass is one row-vs-bounds comparison per block
    (``(B[pos] ≤ v[:,None]).sum(1)`` — n_bins is small by definition).
    """
    import numpy as np

    import ray as _ray

    from ..hashing import hash64_columns
    from .agg import group_quantiles_disc

    if not 2 <= n_bins <= 1024:
        raise ValueError(f"n_bins must be in [2, 1024], got {n_bins}")
    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("quantile_bin requires an Arrow-block dataset")
    for c in [*keys, value_col]:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
    if out_col in schema.names:
        raise ValueError(f"output column {out_col!r} already exists")
    if not pa.types.is_integer(schema.field(value_col).type):
        raise ValueError(
            f"{value_col!r} must be integer (got "
            f"{schema.field(value_col).type}) — quantize floats per the "
            "engine convention"
        )

    qs = [i / n_bins for i in range(1, n_bins)]
    bcols = [f"_b{i}" for i in range(1, n_bins)]
    bounds_ds = group_quantiles_disc(
        ds, list(keys), value_col, qs, bcols, n_buckets=n_buckets
    )
    parts = _ray.get(arrow_block_refs(bounds_ds))
    parts = [t for t in parts if bcols[0] in t.column_names]
    bounds = pa.concat_tables(parts, promote_options="default")
    if bounds.num_rows > max_groups:
        raise ValueError(
            f"quantile_bin: {bounds.num_rows} groups exceed the driver-side "
            f"cap ({max_groups}) — use a join discretizer for unbounded "
            "group domains"
        )
    B = np.stack(
        [
            bounds[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
            for c in bcols
        ],
        axis=1,
    ) if bounds.num_rows else np.zeros((0, n_bins - 1), np.int64)
    ghash = hash64_columns(bounds.select(keys), keys).view(np.int64)
    order = np.argsort(ghash, kind="stable")
    gh_sorted = ghash[order]
    if gh_sorted.size > 1 and (gh_sorted[1:] == gh_sorted[:-1]).any():
        raise ValueError(
            "quantile_bin: hash64 collision between distinct group keys"
        )
    lookup_ref = _ray.put((gh_sorted, B[order]))

    def assign(batch: pa.Table) -> pa.Table:
        gh_s, B_s = _ray.get(lookup_ref)
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        if batch[value_col].null_count:
            raise ValueError(
                f"quantile_bin: {value_col!r} contains nulls — a null has "
                "no bin; filter or impute first"
            )
        h = hash64_columns(batch.select(keys), keys).view(np.int64)
        pos = np.searchsorted(gh_s, h)
        np.clip(pos, 0, max(gh_s.size - 1, 0), out=pos)
        v = batch[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bins = (B_s[pos] <= v[:, None]).sum(axis=1).astype(np.int64)
        return batch.append_column(out_col, pa.array(bins, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def impute_group_mean(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    *,
    flag_col: str | None = "was_imputed",
    max_groups: int = 2_000_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Group-mean null imputation — the SimpleImputer of feature
    pipelines: every NULL value fills with the round-half-up of its
    group's non-null mean, ``FLOOR(double(Σv)/double(n) + 0.5)`` (the
    pinned IEEE recipe the SQL oracle replicates; the fill stays the
    column's integer type).  A group with NO non-null values has no
    mean: its nulls stay NULL.  ``flag_col`` (optional) marks filled
    rows.

    Plan: the non-null moments reduce to one (n, Σv, max|v|) row per
    group (C++ bucket aggregate; wrap-free ``n·max|v|`` horizon
    honesty), collect driver-side (capped), and broadcast via
    collision-checked hash64 for the searchsorted probe in the fill
    pass.  Two streaming scans, zero row-level exchange.
    """
    import numpy as np

    import ray as _ray

    from ..hashing import hash64_columns
    from .agg import _I64_SAFE, bucket_groupby_agg

    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("impute_group_mean requires an Arrow-block dataset")
    for c in [*keys, value_col]:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
    if flag_col is not None and flag_col in schema.names:
        raise ValueError(f"flag column {flag_col!r} already exists")
    if not pa.types.is_integer(schema.field(value_col).type):
        raise ValueError(
            f"{value_col!r} must be integer (got "
            f"{schema.field(value_col).type}) — quantize floats per the "
            "engine convention"
        )

    def derive(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value_col]))
        v = t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                **{k: t[k] for k in keys},
                "_v": pa.array(v, pa.int64()),
                "_av": pa.array(np.abs(v), pa.int64()),
            }
        )

    stats_ds = bucket_groupby_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys,
        [("_v", "sum", "_s"), (None, "count", "_n"), ("_av", "max", "_m")],
        n_buckets=n_buckets,
    )
    parts = [
        t
        for t in _ray.get(arrow_block_refs(stats_ds))
        if "_s" in t.column_names
    ]
    if parts:
        stats = pa.concat_tables(parts, promote_options="default")
    else:
        stats = pa.table(
            {
                **{k: pa.array([], schema.field(k).type) for k in keys},
                "_s": pa.array([], pa.int64()),
                "_n": pa.array([], pa.int64()),
                "_m": pa.array([], pa.int64()),
            }
        )
    if stats.num_rows > max_groups:
        raise ValueError(
            f"impute_group_mean: {stats.num_rows} groups exceed the "
            f"driver-side cap ({max_groups})"
        )
    n_arr = stats["_n"].to_numpy(zero_copy_only=False)
    s_arr = stats["_s"].to_numpy(zero_copy_only=False)
    m_arr = stats["_m"].to_numpy(zero_copy_only=False)
    risk = np.flatnonzero(
        m_arr.astype(object) * n_arr.astype(object) > _I64_SAFE
    )
    if risk.size:
        raise ValueError(
            "impute_group_mean: a group exceeds the int64 Σv horizon — "
            "rescale the quantization"
        )
    fill = np.floor(
        s_arr.astype(np.float64) / n_arr.astype(np.float64) + 0.5
    ).astype(np.int64) if stats.num_rows else np.zeros(0, np.int64)
    ghash = hash64_columns(stats.select(keys), keys).view(np.int64)
    order = np.argsort(ghash, kind="stable")
    gh_sorted = ghash[order]
    if gh_sorted.size > 1 and (gh_sorted[1:] == gh_sorted[:-1]).any():
        raise ValueError(
            "impute_group_mean: hash64 collision between distinct group keys"
        )
    lookup_ref = _ray.put((gh_sorted, fill[order]))
    vtyp = schema.field(value_col).type

    def fill_pass(batch: pa.Table) -> pa.Table:
        gh_s, fill_s = _ray.get(lookup_ref)
        col = batch[value_col]
        is_null = pc.is_null(col)
        n_null = pc.sum(is_null.cast(pa.int64())).as_py() or 0
        out = batch
        if n_null and gh_s.size:
            h = hash64_columns(batch.select(keys), keys).view(np.int64)
            pos = np.searchsorted(gh_s, h)
            np.clip(pos, 0, gh_s.size - 1, out=pos)
            known = gh_s[pos] == h  # all-null groups have no stats row
            nulls = np.asarray(is_null)
            do = nulls & known
            vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            filled = np.where(do, fill_s[pos], 0).astype(np.int64)
            keep_null = nulls & ~do
            merged = np.where(nulls, filled, np.where(np.isnan(vals), 0, vals)).astype(np.int64)
            new_col = pa.array(merged, mask=keep_null, type=pa.int64()).cast(vtyp)
            i = batch.column_names.index(value_col)
            out = batch.set_column(i, value_col, new_col)
            flags = do
        else:
            flags = np.zeros(batch.num_rows, bool)
        if flag_col is not None:
            out = out.append_column(flag_col, pa.array(flags))
        return out

    return ds.map_batches(fill_pass, batch_format="pyarrow")


def group_minmax_scale(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    *,
    out_col: str = "scaled",
    max_groups: int = 2_000_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Grouped min-max scaling — the MinMaxScaler beside
    :func:`~..stages.agg.group_standardize`'s z-score: each row maps to
    ``(v − min_g) / (max_g − min_g)`` in [0, 1].  Min and max are
    WRAP-FREE aggregates, so unlike the moment-based scalers no int64
    horizon exists at any scale; the per-row finish is ONE pinned float
    division (int64→double casts and the subtraction/division are
    correctly rounded — numpy ≡ DuckDB bit-for-bit).  A constant group
    (min == max) has no scale: NULL out, matching the SQL NULLIF oracle.
    NULL values raise loudly (impute first — :func:`impute_group_mean`).

    Same two-scan zero-row-exchange plan as the encode family: one
    (min, max) row per group through the C++ bucket aggregate,
    driver-capped collect, collision-checked hash64 broadcast +
    searchsorted probe."""
    import numpy as np

    import ray as _ray

    from ..hashing import hash64_columns
    from .agg import bucket_groupby_agg

    schema = ds.schema().base_schema
    if not isinstance(schema, pa.Schema):
        raise ValueError("group_minmax_scale requires an Arrow-block dataset")
    for c in [*keys, value_col]:
        if c not in schema.names:
            raise ValueError(f"column {c!r} not in the input")
    if out_col in schema.names:
        raise ValueError(f"output column {out_col!r} already exists")
    if not pa.types.is_integer(schema.field(value_col).type):
        raise ValueError(
            f"{value_col!r} must be integer (got "
            f"{schema.field(value_col).type}) — quantize floats per the "
            "engine convention"
        )

    def derive(batch: pa.Table) -> pa.Table:
        col = batch[value_col]
        if col.null_count:
            raise ValueError(
                f"group_minmax_scale: {value_col!r} contains nulls — "
                "filter or impute first"
            )
        return pa.table(
            {
                **{k: batch[k] for k in keys},
                "_v": col.cast(pa.int64()),
            }
        )

    stats_ds = bucket_groupby_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        keys,
        [("_v", "min", "_lo"), ("_v", "max", "_hi")],
        n_buckets=n_buckets,
    )
    parts = [
        t
        for t in _ray.get(arrow_block_refs(stats_ds))
        if "_lo" in t.column_names
    ]
    stats = pa.concat_tables(parts, promote_options="default")
    if stats.num_rows > max_groups:
        raise ValueError(
            f"group_minmax_scale: {stats.num_rows} groups exceed the "
            f"driver-side cap ({max_groups})"
        )
    lo = stats["_lo"].to_numpy(zero_copy_only=False).astype(np.float64)
    hi = stats["_hi"].to_numpy(zero_copy_only=False).astype(np.float64)
    ghash = hash64_columns(stats.select(keys), keys).view(np.int64)
    order = np.argsort(ghash, kind="stable")
    gh_sorted = ghash[order]
    if gh_sorted.size > 1 and (gh_sorted[1:] == gh_sorted[:-1]).any():
        raise ValueError(
            "group_minmax_scale: hash64 collision between distinct group "
            "keys"
        )
    lookup_ref = _ray.put((gh_sorted, lo[order], hi[order]))

    def scale(batch: pa.Table) -> pa.Table:
        gh_s, lo_s, hi_s = _ray.get(lookup_ref)
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.float64()))
        h = hash64_columns(batch.select(keys), keys).view(np.int64)
        pos = np.searchsorted(gh_s, h)
        np.clip(pos, 0, max(gh_s.size - 1, 0), out=pos)
        v = batch[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        span = hi_s[pos] - lo_s[pos]
        ok = span > 0
        s = np.full(v.size, np.nan, np.float64)
        s[ok] = (v[ok].astype(np.float64) - lo_s[pos][ok]) / span[ok]
        return batch.append_column(
            out_col, pa.array(s, mask=~ok, type=pa.float64())
        )

    return ds.map_batches(scale, batch_format="pyarrow")
