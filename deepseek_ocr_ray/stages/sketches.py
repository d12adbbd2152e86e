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
- **DDSketch quantiles** (Masson et al., VLDB'19): log-spaced counter bins
  with an α relative-error guarantee; merge = counter addition (here a
  plain ``groupby(sign, bin).sum`` — the sketch IS a tiny keyed
  aggregate), so estimates are parallelism-invariant.
- **count-min** point frequencies (Cormode & Muthukrishnan 2005): d×w
  counter matrix, merge = matrix addition, estimate = min over rows —
  never underestimates; overshoot bounded by collisions.
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


# ---------------------------------------------------------------------------
# DDSketch-style quantiles (Masson et al., VLDB'19 — log-spaced bins,
# relative-error guarantee, merge = counter addition)
# ---------------------------------------------------------------------------

DD_ZERO_EPS = 1e-9


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_partial(values: np.ndarray, alpha: float) -> pa.Table:
    """Per-block DDSketch partial: ``(sign, bin, n)`` counter rows.

    ``sign`` is -1/0/+1; positive x lands in bin ``ceil(log_γ x)`` (so
    x ∈ (γ^(i-1), γ^i]), negatives mirror on |x|, |x| ≤ 1e-9 goes to the
    zero bucket.  Bin count is bounded by the value range (~log_γ(max/min)
    bins ≈ 2,000 at α=0.01 over 12 decades), independent of row count."""
    x = np.asarray(values, np.float64)
    x = x[~np.isnan(x)]
    log_gamma = np.log(_dd_gamma(alpha))
    signs, bins = [], []
    pos = x > DD_ZERO_EPS
    neg = x < -DD_ZERO_EPS
    nz = len(x) - int(pos.sum()) - int(neg.sum())
    out_s, out_b, out_n = [], [], []
    for s, vals in ((1, x[pos]), (-1, -x[neg])):
        if len(vals):
            b = np.ceil(np.log(vals) / log_gamma).astype(np.int64)
            ub, cnt = np.unique(b, return_counts=True)
            out_s.append(np.full(len(ub), s, np.int64))
            out_b.append(ub)
            out_n.append(cnt.astype(np.int64))
    if nz:
        out_s.append(np.array([0], np.int64))
        out_b.append(np.array([0], np.int64))
        out_n.append(np.array([nz], np.int64))
    if not out_s:
        return pa.table(
            {"sign": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "sign": pa.array(np.concatenate(out_s)),
            "bin": pa.array(np.concatenate(out_b)),
            "n": pa.array(np.concatenate(out_n)),
        }
    )


def dd_quantiles(
    bins: pa.Table, qs: tuple[float, ...], alpha: float
) -> pa.Table:
    """Quantile estimates from merged ``(sign, bin, n)`` counters.

    Rank convention matches ``quantile_disc``: the q-quantile is the value
    at 1-based rank ``floor(q·(N-1)) + 1`` of the sorted multiset; the
    estimate for a log bin is the linear midpoint γ^(i-1)·(1+γ)/2, giving
    relative error ≤ α/(1-α)."""
    gamma = _dd_gamma(alpha)
    sign = bins["sign"].to_numpy(zero_copy_only=False)
    bn = bins["bin"].to_numpy(zero_copy_only=False)
    n = bins["n"].to_numpy(zero_copy_only=False)
    # ascending value order: negatives by bin DESC, zero, positives by ASC
    order = np.lexsort((np.where(sign < 0, -bn, bn), sign))
    sign, bn, n = sign[order], bn[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_est = [], []
    for q in qs:
        if total == 0:
            out_q.append(q)
            out_est.append(float("nan"))
            continue
        rank = int(np.floor(q * (total - 1))) + 1
        i = int(np.searchsorted(cum, rank))
        s, b = int(sign[i]), int(bn[i])
        if s == 0:
            est = 0.0
        else:
            est = s * (gamma ** (b - 1)) * (1.0 + gamma) / 2.0
        out_q.append(q)
        out_est.append(round(est, 6))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "est": pa.array(out_est, pa.float64())}
    )


def ddsketch_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    *,
    alpha: float = 0.01,
) -> ray.data.Dataset:
    """Approximate quantiles with an α relative-error guarantee.

    Per-block log-histogram partials → ``groupby(sign, bin).sum`` (the
    exchange carries bounded counter rows per block, never values) → one
    final walk.  Merging is counter addition: associative, commutative —
    estimates are identical at any parallelism, so the result is
    fixture-pinnable like the HLL estimate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return dd_partial(
            batch[col].to_numpy(zero_copy_only=False), alpha
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["sign", "bin"])
        .aggregate(Sum("n"))
        .rename_columns({"sum(n)": "n"})
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return dd_quantiles(batch, qs, alpha)

    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketch (Cormode & Muthukrishnan 2005 — d×w counter
# matrix, merge = matrix addition, point estimate = min over rows)
# ---------------------------------------------------------------------------

_CMS_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_positions(tokens: pa.Array, d: int, w: int) -> np.ndarray:
    """(d, n_tokens) column positions — engine string hash mixed with a
    per-row salt, all vectorized."""
    from ..hashing import mix64, string_hash64

    base = string_hash64(tokens)
    return np.stack(
        [mix64(base ^ _CMS_SALTS[j]) % np.uint64(w) for j in range(d)]
    ).astype(np.int64)


def cms_partial(tokens: pa.Array, d: int = 4, w: int = 4096) -> np.ndarray:
    """Per-block (d, w) int64 counter matrix."""
    m = np.zeros((d, w), np.int64)
    if len(tokens):
        pos = _cms_positions(tokens, d, w)
        for j in range(d):
            np.add.at(m[j], pos[j], 1)
    return m


def cms_estimate(m: np.ndarray, probes: pa.Array) -> np.ndarray:
    """Point-frequency estimates (min over rows) — never underestimates."""
    d, w = m.shape
    if not len(probes):
        return np.array([], np.int64)
    pos = _cms_positions(probes, d, w)
    return np.min(
        np.stack([m[j, pos[j]] for j in range(d)]), axis=0
    ).astype(np.int64)


def cms_token_freq(
    ds: ray.data.Dataset,
    col: str,
    probes: list[str],
    *,
    d: int = 4,
    w: int = 4096,
) -> ray.data.Dataset:
    """Approximate frequencies of ``probes`` over a token column.

    Same skeleton as the HLL: per-block (d×w) counter matrices ride the
    exchange as fixed-size blobs (128 KiB at 4×4096), tree-combined by
    matrix addition (order-independent ⇒ parallelism-invariant), one
    finalize task answers the probes.  Estimates are exact upper bounds:
    est ≥ true count always; overshoot is bounded by collisions
    (≤ total/w per row in expectation, min over d rows)."""
    probe_arr = pa.array(sorted(probes), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        col_arr = batch[col]
        if isinstance(col_arr, pa.ChunkedArray):
            col_arr = col_arr.combine_chunks()
        m = cms_partial(col_arr, d, w)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def _merge(batch: pa.Table) -> np.ndarray:
        merged = np.zeros((d, w), np.int64)
        for blob in batch["m"].to_pylist():
            merged += np.frombuffer(blob, np.int64).reshape(d, w)
        return merged

    def combine(batch: pa.Table) -> pa.Table:
        return pa.table({"m": pa.array([_merge(batch).tobytes()], pa.binary())})

    def finalize(batch: pa.Table) -> pa.Table:
        est = cms_estimate(_merge(batch), probe_arr)
        return pa.table({"token": probe_arr, "est_n": pa.array(est)})

    return (
        partials.repartition(8)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# per-group HLL distinct (GROUP BY g, approx COUNT(DISTINCT v))
# ---------------------------------------------------------------------------


def group_hll_partial(
    batch: pa.Table, group_col: str, value_col: str, p: int = 12
) -> pa.Table:
    """Block → one (group, registers) row per distinct group in the block.

    The per-group loop is bounded by GROUP CARDINALITY inside the block
    (dictionary-encoded), not row count; register computation stays
    vectorized per group."""
    groups = batch[group_col]
    if isinstance(groups, pa.ChunkedArray):
        groups = groups.combine_chunks()
    enc = groups.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary
    blobs = []
    for gi in range(len(uniq)):
        vals = batch[value_col].filter(pa.array(codes == gi))
        blobs.append(hll_partial(vals, p).tobytes())
    return pa.table(
        {
            group_col: uniq.take(pa.array(range(len(uniq)), pa.int64())),
            "regs": pa.array(blobs, pa.binary()),
        }
    )


def group_hll_distinct(
    ds: ray.data.Dataset, group_col: str, value_col: str, *, p: int = 12
) -> ray.data.Dataset:
    """Approximate ``SELECT g, COUNT(DISTINCT v) GROUP BY g``.

    Map side emits one 2^p-byte register blob per (block, group) — the
    exchange volume is blocks × groups × 4 KiB, independent of row count —
    then ONE keyed exchange merges registers per group (max is associative
    and order-independent, so estimates are parallelism-invariant)."""

    def partial(batch: pa.Table) -> pa.Table:
        return group_hll_partial(batch, group_col, value_col, p)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in group["regs"].to_pylist():
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
        return pa.table(
            {
                group_col: group[group_col].slice(0, 1),
                "approx_distinct": pa.array([hll_estimate(regs)], pa.int64()),
            }
        )

    return partials.groupby(group_col).map_groups(
        merge, batch_format="pyarrow"
    )


def group_distinct_exact(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Exact ``SELECT g, COUNT(DISTINCT v) GROUP BY g`` — the oracled
    companion.  Per-block distinct (group, value) pairs first (C++
    group_by), so the exchange carries one row per distinct pair per
    block; the global pair-distinct and the per-group count share one
    keyed exchange (groupby value-pair → count is a second tiny agg over
    one row per distinct pair)."""

    def local(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([])

    pairs = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .count()
    )

    def per_group(batch: pa.Table) -> pa.Table:
        g = batch.group_by(group_col).aggregate([(value_col, "count")])
        return g.rename_columns([group_col, "partial_n"])

    from ray.data.aggregate import Sum

    return (
        pairs.map_batches(per_group, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("partial_n"))
        .rename_columns({"sum(partial_n)": "n_distinct"})
    )


# ---------------------------------------------------------------------------
# heavy hitters: two-pass EXACT top-k via Misra-Gries candidate generation
# ---------------------------------------------------------------------------


def mg_topk(
    ds: ray.data.Dataset,
    tokens_fn,
    *,
    k: int = 25,
    capacity: int = 4096,
    candidate_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """Exact global top-k items WITHOUT a full-vocabulary exchange.

    The brute plan (``token_vocab``) shuffles one row per distinct item per
    block — fine for word vocabularies, quadratic pain for open vocabularies
    (URLs, n-grams, ids).  This is the scale plan:

    1. **Summary pass** — per block, exact C++ group counts trimmed by the
       Misra-Gries rule (subtract the (capacity+1)-th largest count, keep
       positive): ≤ ``capacity`` summary rows per block move, and any item
       absent from a block's summary has block count ≤ the subtracted
       threshold, so a GLOBALLY absent item has true count < total/capacity.
    2. **Verify pass** — the candidate union (bounded by blocks × capacity,
       guarded by ``candidate_cap``) is broadcast once; a second scan counts
       EXACTLY only the candidate items (``pc.is_in`` filter before the
       group_by), then one small exchange + sort + limit.

    The result is exact, and provably so: the k-th exact count must be
    ≥ total/capacity (checked — raises with a "grow capacity" message
    otherwise), so no non-candidate can reach the top k even on ties.
    """

    def summary(batch: pa.Table) -> pa.Table:
        toks = tokens_fn(batch)
        t = pa.table({"token": toks}).group_by("token").aggregate(
            [([], "count_all")]
        )
        cnts = t["count_all"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        total = int(cnts.sum())
        if t.num_rows > capacity:
            thresh = np.partition(cnts, len(cnts) - capacity - 1)[
                len(cnts) - capacity - 1
            ]
            keep = cnts > thresh
            kept = pa.table(
                {
                    "token": t["token"].filter(pa.array(keep)),
                    "mg": pa.array(cnts[keep] - thresh, pa.int64()),
                }
            )
        else:
            kept = pa.table(
                {"token": t["token"], "mg": pa.array(cnts, pa.int64())}
            )
        sentinel = pa.table(
            {"token": pa.array([""], kept["token"].type)
             if kept.num_rows == 0 else pa.array([""]).cast(kept["token"].type),
             "mg": pa.array([0], pa.int64())}
        )
        kept = pa.concat_tables([kept, sentinel], promote_options="default")
        return kept.append_column(
            "n_block",
            pa.array(
                [0] * (kept.num_rows - 1) + [total], pa.int64()
            ),
        )

    from ray.data.aggregate import Sum as RSum

    summaries = (
        ds.map_batches(summary, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(RSum("mg"), RSum("n_block"))
    )
    # the summary union is bounded by blocks × capacity rows; one driver
    # materialization (guarded below).  "" is the per-block total sentinel —
    # tokens_fn must never emit the empty string.
    srows = summaries.take_all()
    cand_rows = [r for r in srows if r["token"] != ""]
    total = sum(r["sum(n_block)"] for r in srows if r["token"] == "")
    if len(cand_rows) > candidate_cap:
        raise ValueError(
            f"mg_topk: candidate union {len(cand_rows)} exceeds "
            f"candidate_cap={candidate_cap} — lower capacity or raise the cap"
        )
    cand_set = pa.array(sorted(r["token"] for r in cand_rows), pa.string())
    cref = ray.put(cand_set)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cands = ray.get(cref)
        toks = tokens_fn(batch)
        toks = toks.filter(pc.is_in(toks, value_set=cands))
        t = pa.table({"token": toks}).group_by("token").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": t["token"], "n": t["count_all"].cast(pa.int64())}
        )

    topk = (
        ds.map_batches(exact_counts, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(RSum("n"))
        .rename_columns({"sum(n)": "n"})
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )
    rows = topk.take_all()
    if len(rows) == k and total and rows[-1]["n"] < total / capacity:
        raise ValueError(
            f"mg_topk: guarantee check failed — k-th count {rows[-1]['n']} "
            f"< total/capacity = {total / capacity:.1f}; grow capacity"
        )
    out = pa.table(
        {
            "token": pa.array([r["token"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def group_ddsketch_quantiles(
    ds: ray.data.Dataset,
    keys: list[str],
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    *,
    alpha: float = 0.01,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-GROUP DDSketch quantiles — one ``(keys..., q, est)`` row per
    group×quantile, with the same α relative-error guarantee and
    parallelism-invariance as :func:`ddsketch_quantiles` (counter-addition
    merges), so outputs fixture-pin like the global sketch.

    The partial pass is fully vectorized even across groups: sign/bin are
    computed per ROW (numpy), then ONE C++ ``group_by(keys, sign, bin)``
    per block reduces to counter rows; the exchange carries
    groups × bins per block (bins bounded by the value range, ~2k at
    α=0.01 over 12 decades — row-count-independent).  The finalize walks
    each group's merged counters (bounded per-group loop over sorted
    runs; the interior is the shared ``dd_quantiles``)."""
    from ..hashing import hash64_columns

    log_gamma = np.log(_dd_gamma(alpha))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        sign = np.zeros(len(x), np.int64)
        sign[x > DD_ZERO_EPS] = 1
        sign[x < -DD_ZERO_EPS] = -1
        bn = np.zeros(len(x), np.int64)
        nz = sign != 0
        bn[nz] = np.ceil(np.log(np.abs(x[nz])) / log_gamma).astype(np.int64)
        t = pa.table(
            {
                **{k: batch[k] for k in keys},
                "sign": pa.array(sign),
                "bin": pa.array(bn),
            }
        ).filter(pa.array(ok))
        g = t.group_by(keys + ["sign", "bin"]).aggregate([([], "count_all")])
        cols = {k: g[k] for k in keys}
        cols["sign"] = g["sign"]
        cols["bin"] = g["bin"]
        cols["n"] = g["count_all"].cast(pa.int64())
        out = pa.table(cols)
        bucket = hash64_columns(out, keys) % np.uint64(n_buckets)
        return out.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    def finalize(group: pa.Table) -> pa.Table:
        g = group.group_by(keys + ["sign", "bin"]).aggregate([("n", "sum")])
        g = g.sort_by([(k, "ascending") for k in keys])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    **{k: g[k] for k in keys},
                    "q": pa.array([], pa.float64()),
                    "est": pa.array([], pa.float64()),
                }
            )
        changed = np.zeros(n - 1, bool)
        for k in keys:  # exact run boundaries: any key column changes
            enc = pa.compute.dictionary_encode(g[k])
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            c = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            changed |= c[1:] != c[:-1]
        starts = np.flatnonzero(np.r_[True, changed])
        ends = np.r_[starts[1:], n]
        outs = []
        for s, e in zip(starts, ends):  # bounded: one iteration per group
            sub = g.slice(s, e - s)
            est = dd_quantiles(
                pa.table(
                    {"sign": sub["sign"], "bin": sub["bin"],
                     "n": sub["n_sum"]}
                ),
                qs,
                alpha,
            )
            key_cols = {
                k: pa.concat_arrays(
                    [sub[k].combine_chunks().slice(0, 1)] * est.num_rows
                )
                for k in keys
            }
            outs.append(
                pa.table({**key_cols, "q": est["q"], "est": est["est"]})
            )
        if not outs:
            return pa.table(
                {
                    **{k: g[k] for k in keys},
                    "q": pa.array([], pa.float64()),
                    "est": pa.array([], pa.float64()),
                }
            )
        return pa.concat_tables(outs)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finalize, batch_format="pyarrow")
    )
