"""Edit-distance similarity join — every DISTINCT-value pair of a string
column within a Levenshtein bound, WITHOUT comparing all pairs.

Semantics: byte-level Levenshtein over the UTF-8 encoding (exactly
DuckDB's ``levenshtein``, which counts byte edits — ``levenshtein('é',
'e') = 2``; equal to character-level on ASCII).  Pairs are emitted once,
ordered ``name_a < name_b`` bytewise (== Python str order on UTF-8).

Banding: the SymSpell deletion neighborhood.  If ``lev(a, b) ≤ d`` then
the matched positions of an optimal alignment form a common string
reachable by ≤ d deletions from EACH side (a loses its deleted +
substituted bytes, b its inserted + substituted ones), so ``a`` and
``b`` share at least one member of their ≤ d-deletion variant sets.
Grouping by variant therefore finds every true pair; a hash collision
between different variants only ADDS candidates, which the exact verify
kills — completeness never rests on the hash.

Plan (three bounded exchanges; nothing corpus-sized ever moves):

1. distinct reduction — per-block C++ ``group_by(column).count()`` then
   the standard coarse-bucket exchange (``stages/agg.py``): one row per
   distinct value with its global row count.  This is the only stage
   that sees corpus rows, and it only moves (block-distinct value, n).
2. variant expansion — zero-exchange ``map_batches`` over the distinct
   values: each value of byte length L emits ``1 + L + C(L,2)`` variant
   HASHES (``max_dist = 2``).  No variant string is materialized: a
   prefix/suffix polynomial-hash decomposition yields every deletion
   variant's hash in O(1) from two cumulative arrays (the FNV prime is
   odd, hence invertible mod 2^64, so the mid-segment realignment is a
   single multiply by the precomputed inverse).
3. candidate pairing — ONE exchange keyed on the variant hash; each
   equal-hash run contributes its C(k,2) value pairs via segmented-
   arange indices (cf. ``dedup.py``), deduplicated within the group by
   exact within-group rank arithmetic.  Runs are bounded by the number
   of distinct values within distance ~2d of one another — the
   operator's own output density, not the corpus size.
4. pair dedup + verify — ONE exchange on the pair hash; per group an
   exact C++ ``group_by(name_a, name_b)`` dedup (no hash identity on
   the output path), then a fully vectorized cross-pair Levenshtein:
   the classic row DP where the in-row insertion chain
   ``D[i] = min(t[i], D[i-1]+1)`` is closed into
   ``i + running_min(t[k] - k)`` — one ``np.minimum.accumulate`` per
   target byte, every pair advanced simultaneously, zero per-pair
   Python.

Scale: exchange volumes are (distinct values) → (distinct × C(L,≤d))
→ (candidate pairs).  The operator targets SHORT string columns
(names, titles, codes): ``max_len`` (default 64) rejects longer values
explicitly rather than silently degrading — for long-text similarity
use the MinHash / SimHash / n-gram families in ``stages/dedup.py``.
No reference counterpart (the reference has no relational surface);
fuzzy key matching is table-stakes for entity resolution in corpus
curation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashing import _POLY_P, binary_parts, mix64, splitmix_bucket, string_hash64
from .agg import bucket_groupby_sum

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
# multiplicative inverse of the FNV prime mod 2^64 (P is odd)
_POLY_P_INV = np.uint64(pow(int(_POLY_P), -1, 1 << 64))


def _fold(raw: np.ndarray, length: int) -> np.ndarray:
    """Finish a raw polynomial hash: fold the variant length, avalanche."""
    fold = np.uint64((int(length) * int(_GOLDEN)) & 0xFFFFFFFFFFFFFFFF)
    return mix64(raw ^ fold)


def _deletion_variant_hashes(
    mat: np.ndarray, max_dist: int
) -> tuple[np.ndarray, np.ndarray]:
    """All ≤ ``max_dist``-deletion variant hashes of each row of a byte
    matrix ``(m, L)``.

    Returns ``(hashes, row_idx)`` — flat uint64 hashes plus the source
    row of each.  Hash of a byte string s = ``mix64(Σ (s[t]+1)·P^(len−1−t)
    XOR len·golden)`` — identical to hashing the materialized variant,
    but computed in O(1) per variant from prefix/suffix cumulatives.
    """
    m, L = mat.shape
    b1 = mat.astype(np.uint64) + np.uint64(1)
    powers = np.full(max(L, 1), _POLY_P, np.uint64)
    if L:
        powers[0] = np.uint64(1)
    powers = np.cumprod(powers)  # P^0..P^(L-1), wraps mod 2^64

    # pre[:, j] = hash of prefix s[:j] in its OWN alignment (Σ (s[t]+1)·P^(j−1−t))
    pre = np.zeros((m, L + 1), np.uint64)
    for j in range(1, L + 1):
        pre[:, j] = pre[:, j - 1] * _POLY_P + b1[:, j - 1]
    # suf[:, j] = Σ_{t≥j} (s[t]+1)·P^(L−1−t)  (full-string alignment)
    contrib = b1 * powers[::-1][None, :] if L else np.zeros((m, 0), np.uint64)
    suf = np.zeros((m, L + 1), np.uint64)
    if L:
        suf[:, :L] = np.cumsum(contrib[:, ::-1], axis=1)[:, ::-1]

    rows = np.arange(m, dtype=np.int64)
    hs = [_fold(suf[:, 0], L)]  # d = 0: the value itself
    idx = [rows]
    if max_dist >= 1 and L >= 1:
        # delete position j (variant length L−1): prefix realigns by
        # P^(L−1−j), suffix after j keeps its exponents (shift left by
        # one position AND one length — they cancel).
        for j in range(L):
            raw = pre[:, j] * powers[L - 1 - j] + suf[:, j + 1]
            hs.append(_fold(raw, L - 1))
            idx.append(rows)
    if max_dist >= 2 and L >= 2:
        # delete j1 < j2 (variant length L−2): prefix realigns by
        # P^(L−2−j1); the mid segment (j1, j2) shifts one position at
        # unchanged length − 1 → multiply by P⁻¹; the tail shifts two
        # positions at length − 2 → unchanged.
        for j1 in range(L - 1):
            j2 = np.arange(j1 + 1, L, dtype=np.int64)
            # mid = positions strictly between j1 and j2: Σ_{t∈(j1,j2)}
            mid = (suf[:, j1 + 1][:, None] - suf[:, j2]) * _POLY_P_INV
            raw = (
                (pre[:, j1] * powers[L - 2 - j1])[:, None]
                + mid
                + suf[:, j2 + 1]
            )
            hs.append(_fold(raw, L - 2).ravel())
            idx.append(np.repeat(rows, len(j2)))
    return np.concatenate(hs), np.concatenate(idx)


def levenshtein_pairs(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Exact byte-level Levenshtein distance of each (a[i], b[i]) pair,
    every pair advanced simultaneously — O(maxlen) vector passes, zero
    per-pair Python.  Inputs are string/binary arrays of equal length."""
    a = a.cast(pa.large_binary())
    b = b.cast(pa.large_binary())
    off_a, dat_a = binary_parts(a)
    off_b, dat_b = binary_parts(b)
    la = np.diff(off_a).astype(np.int64)
    lb = np.diff(off_b).astype(np.int64)
    n = len(la)
    if n == 0:
        return np.empty(0, np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))

    def gather(off: np.ndarray, dat: np.ndarray, L: int) -> np.ndarray:
        if L == 0:
            return np.empty((n, 0), np.uint8)
        ix = off[:-1, None] + np.arange(L, dtype=np.int64)[None, :]
        np.clip(ix, 0, max(len(dat) - 1, 0), out=ix)
        return (
            dat[ix] if len(dat) else np.zeros((n, L), np.uint8)
        )  # padded bytes are garbage but never read past each la/lb

    A = gather(off_a, dat_a, La)
    B = gather(off_b, dat_b, Lb)
    ar = np.arange(La + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (n, La + 1)).copy()  # D[0][i] = i
    out = la.astype(np.int32).copy()  # pairs with lb == 0
    for j in range(1, Lb + 1):
        t = np.empty((n, La + 1), np.int32)
        t[:, 0] = j
        cost = (A != B[:, j - 1 : j]).astype(np.int32)
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        # D[j][i] = min(t[i], D[j][i−1]+1) = i + running_min(t[k] − k)
        t -= ar
        np.minimum.accumulate(t, axis=1, out=t)
        t += ar
        hit = lb == j
        if hit.any():
            out[hit] = t[hit, la[hit]]
        prev = t
    return out.astype(np.int64)


def jaro_winkler_pairs(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Exact byte-level Jaro-Winkler similarity of each (a[i], b[i]) pair,
    every pair advanced simultaneously — the greedy match walk loops over
    the ≤ ``max_len`` positions of ``a`` with every pair's window scanned
    as one boolean matrix per step; transpositions close with two rank
    scatters.  Bit-identical to DuckDB's ``jaro_winkler_similarity`` on
    ASCII (verified pairwise in tests): same greedy window matching, same
    ``(m/l1 + m/l2 + (m−t)/m) / 3`` jaro, same 0.7-gated
    ``sim + ℓ·0.1·(1−sim)`` Winkler prefix boost (ℓ ≤ 4) — every float op
    correctly rounded in the same order on both sides."""
    a = a.cast(pa.large_binary())
    b = b.cast(pa.large_binary())
    off_a, dat_a = binary_parts(a)
    off_b, dat_b = binary_parts(b)
    la = np.diff(off_a).astype(np.int64)
    lb = np.diff(off_b).astype(np.int64)
    n = len(la)
    if n == 0:
        return np.empty(0, np.float64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))

    def gather(off: np.ndarray, dat: np.ndarray, L: int) -> np.ndarray:
        if L == 0:
            return np.empty((n, 0), np.uint8)
        ix = off[:-1, None] + np.arange(L, dtype=np.int64)[None, :]
        np.clip(ix, 0, max(len(dat) - 1, 0), out=ix)
        return dat[ix] if len(dat) else np.zeros((n, L), np.uint8)

    A = gather(off_a, dat_a, La)
    B = gather(off_b, dat_b, Lb)
    md = np.maximum(la, lb) // 2 - 1  # may be negative: empty window
    jcols = np.arange(Lb, dtype=np.int64)[None, :]
    in_b = jcols < lb[:, None]
    m2 = np.zeros((n, Lb), bool)
    m1 = np.zeros((n, max(La, 1)), bool)
    for i in range(La if Lb else 0):  # a zero-width B has no windows
        active = i < la
        if not active.any():
            break
        elig = (
            (jcols >= (i - md)[:, None])
            & (jcols <= (i + md)[:, None])
            & in_b
            & (B == A[:, i : i + 1])
            & ~m2
            & active[:, None]
        )
        hit = elig.any(axis=1)
        j_sel = np.argmax(elig, axis=1)
        m1[hit, i] = True
        m2[hit[:, None] & (jcols == j_sel[:, None])] = True
    m = m1.sum(axis=1).astype(np.int64)
    max_m = int(m.max(initial=0))
    # k-th matched byte of each side, aligned by rank — transpositions are
    # rank-aligned mismatches, halved
    seq_a = np.zeros((n, max(max_m, 1)), np.uint8)
    seq_b = np.zeros((n, max(max_m, 1)), np.uint8)
    if max_m:
        ra = np.cumsum(m1, axis=1) - 1
        rows, cols = np.nonzero(m1)
        seq_a[rows, ra[rows, cols]] = A[rows, cols]
        rb = np.cumsum(m2, axis=1) - 1
        rows, cols = np.nonzero(m2)
        seq_b[rows, rb[rows, cols]] = B[rows, cols]
    kmask = np.arange(max(max_m, 1), dtype=np.int64)[None, :] < m[:, None]
    t = ((seq_a != seq_b) & kmask).sum(axis=1).astype(np.int64) // 2
    # jaro in DuckDB's op order; m == 0 (or an empty side) scores 0
    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        sim = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    sim = np.where(m == 0, 0.0, sim)
    # identical strings are 1.0 BEFORE any windowing (len ≤ 3 equal
    # strings have an empty match window yet score 1.0 in DuckDB too) —
    # but an empty side scores 0.0 even against another empty (DuckDB)
    L_eq = min(La, Lb)  # la == lb implies la <= L_eq, so this covers all
    icols = np.arange(L_eq, dtype=np.int64)[None, :]
    eq = (la == lb) & (
        (A[:, :L_eq] == B[:, :L_eq]) | (icols >= la[:, None])
    ).all(axis=1)
    sim = np.where(eq, 1.0, sim)
    sim = np.where((la == 0) | (lb == 0), 0.0, sim)
    # Winkler prefix boost, gated at 0.7, prefix capped at 4 bytes
    pl = np.minimum(np.minimum(la, lb), 4)
    pref = np.zeros(n, np.int64)
    live = np.ones(n, bool)
    for i in range(min(4, La, Lb)):
        live &= (i < pl) & (A[:, i] == B[:, i])
        pref += live.astype(np.int64)
    boost = sim > 0.7
    return np.where(boost, sim + pref * 0.1 * (1.0 - sim), sim)


def jaro_winkler_join(
    ds: ray.data.Dataset,
    column: str,
    *,
    min_jw: float = 0.0,
    max_dist: int = 2,
    max_len: int = 64,
    n_buckets: int = 64,
    value_type: pa.DataType | None = None,
) -> ray.data.Dataset:
    """Jaro-Winkler-scored similarity join: every distinct-value pair of
    ``column`` within Levenshtein ``max_dist`` (the tractable candidate
    band — JW itself admits no complete banding bound) whose byte-level
    Jaro-Winkler similarity is ≥ ``min_jw``.  Output adds a ``jw`` double
    to :func:`edit_distance_join`'s columns; the score/filter pass is a
    zero-exchange ``map_batches`` over the verified pairs, so the plan
    and its scale story are exactly the edit-distance join's.

    The candidate band is part of the SEMANTICS (pairs farther than
    ``max_dist`` edits never appear however high their JW — document it
    in the consuming query's oracle as ``levenshtein(a,b) <= d AND
    jaro_winkler_similarity(a,b) >= θ``)."""
    pairs = edit_distance_join(
        ds,
        column,
        max_dist,
        max_len=max_len,
        n_buckets=n_buckets,
        value_type=value_type,
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("jw", pa.array([], pa.float64()))
        jw = jaro_winkler_pairs(
            batch["name_a"].combine_chunks(),
            batch["name_b"].combine_chunks(),
        )
        out = batch.append_column("jw", pa.array(jw, pa.float64()))
        if min_jw > 0.0:
            out = out.filter(pa.array(jw >= min_jw))
        return out

    return pairs.map_batches(score, batch_format="pyarrow")


def edit_distance_join(
    ds: ray.data.Dataset,
    column: str,
    max_dist: int = 2,
    *,
    max_len: int = 64,
    n_buckets: int = 64,
    value_type: pa.DataType | None = None,
) -> ray.data.Dataset:
    """All DISTINCT-value pairs of ``column`` with byte-level Levenshtein
    distance ≤ ``max_dist`` (1 or 2).  Output one row per unordered pair:
    ``(name_a, name_b, dist, count_a, count_b)`` with ``name_a < name_b``
    bytewise and counts = the values' corpus row counts.

    Values longer than ``max_len`` UTF-8 bytes raise (the deletion
    neighborhood is quadratic in length — this operator targets short
    key columns; use the MinHash/SimHash families for long text).

    NULL values never pair (dropped at the scan) — exactly the SQL
    oracle's behavior (``levenshtein(NULL, x)`` is NULL and a NULL key
    fails ``a < b``).  ``value_type`` overrides the output string type
    (defaults to the input column's type; resolving it probes
    ``ds.schema()``, free on read-backed inputs).
    """
    if max_dist not in (1, 2):
        raise ValueError(
            f"edit_distance_join: max_dist={max_dist!r} must be 1 or 2 "
            "(the deletion-neighborhood enumeration is bounded by design)"
        )
    if max_len < 1:
        raise ValueError("edit_distance_join: max_len must be >= 1")
    if value_type is None:
        sch = ds.schema()
        if sch is None:
            raise ValueError(
                "edit_distance_join: input has no derivable schema — "
                "pass value_type=pa.DataType"
            )
        value_type = sch.base_schema.field(column).type
    vt = value_type

    distinct = bucket_groupby_sum(
        ds.map_batches(
            lambda b: b.select([column]).drop_null(), batch_format="pyarrow"
        ),
        keys=[column],
        sum_cols=[],
        count_col="cnt",
        n_buckets=n_buckets,
    )

    def expand(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vh": pa.array([], pa.int64()),
                "val": pa.array([], vt),
                "cnt": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        vals = batch[column].combine_chunks().cast(pa.large_binary())
        off, data = binary_parts(vals)
        lens = np.diff(off).astype(np.int64)
        too_long = lens > max_len
        if too_long.any():
            bad = int(lens.max())
            raise ValueError(
                f"edit_distance_join: a {column!r} value is {bad} UTF-8 "
                f"bytes (> max_len={max_len}); this operator targets "
                "short key columns — raise max_len explicitly or use "
                "the MinHash/SimHash dedup families for long text"
            )
        all_h: list[np.ndarray] = []
        all_i: list[np.ndarray] = []
        for L in np.unique(lens):
            sel = np.flatnonzero(lens == L)
            L = int(L)
            if L == 0:
                mat = np.empty((len(sel), 0), np.uint8)
            else:
                ix = off[sel, None] + np.arange(L, dtype=np.int64)[None, :]
                mat = data[ix]
            hs, rel = _deletion_variant_hashes(mat, max_dist)
            all_h.append(hs)
            all_i.append(sel[rel])
        vh = np.concatenate(all_h)
        ridx = np.concatenate(all_i)
        # per-value variant dedup (different deletions can coincide,
        # e.g. "aab" − pos0 == "aab" − pos1): exact on (row, hash)
        order = np.lexsort((vh, ridx))
        vh, ridx = vh[order], ridx[order]
        keep = np.r_[
            True, (vh[1:] != vh[:-1]) | (ridx[1:] != ridx[:-1])
        ]
        vh, ridx = vh[keep], ridx[keep]
        take = pa.array(ridx, pa.int64())
        return pa.table(
            {
                "vh": pa.array(vh.view(np.int64), pa.int64()),
                "val": batch[column].take(take),
                "cnt": batch["cnt"].take(take).cast(pa.int64()),
                "bucket": pa.array(
                    splitmix_bucket(vh, n_buckets).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "name_a": pa.array([], vt),
                "name_b": pa.array([], vt),
                "count_a": pa.array([], pa.int64()),
                "count_b": pa.array([], pa.int64()),
                "bucket2": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "vh" not in group.column_names:
            return empty
        vh = group["vh"].to_numpy(zero_copy_only=False).view(np.uint64)
        # bytewise value rank within the group — exact pair identity and
        # canonical (a < b) orientation without any hash on the hot path
        rank_of_sorted = pc.sort_indices(group["val"]).to_numpy(
            zero_copy_only=False
        )
        rank = np.empty(len(vh), np.int64)
        rank[rank_of_sorted] = np.arange(len(vh), dtype=np.int64)
        order = np.lexsort((rank, vh))
        vh_s, rank_s = vh[order], rank[order]
        n = len(vh_s)
        new_run = np.r_[True, vh_s[1:] != vh_s[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id).astype(np.int64)
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(run_len)[:-1]], run_len
        )
        seg = run_len[run_id] - pos - 1  # partners following each row
        total = int(seg.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), seg)
        cum0 = np.r_[0, np.cumsum(seg)[:-1]]
        b_idx = a_idx + (
            np.arange(total, dtype=np.int64) - np.repeat(cum0, seg)
        ) + 1
        ra, rb = rank_s[a_idx], rank_s[b_idx]
        lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
        same = lo == hi  # same value via two colliding variants
        lo, hi = lo[~same], hi[~same]
        key = lo * np.int64(n) + hi  # exact within-group pair identity
        key = np.unique(key)
        lo, hi = key // np.int64(n), key % np.int64(n)
        back = np.empty(n, np.int64)  # rank → group row
        back[rank] = np.arange(n, dtype=np.int64)
        ta, tb = pa.array(back[lo]), pa.array(back[hi])
        name_a, name_b = group["val"].take(ta), group["val"].take(tb)
        pk = mix64(
            string_hash64(name_a) ^ (string_hash64(name_b) * _GOLDEN)
        )
        return pa.table(
            {
                "name_a": name_a,
                "name_b": name_b,
                "count_a": group["cnt"].take(ta).cast(pa.int64()),
                "count_b": group["cnt"].take(tb).cast(pa.int64()),
                "bucket2": pa.array(
                    splitmix_bucket(pk, n_buckets).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "name_a": pa.array([], vt),
                "name_b": pa.array([], vt),
                "dist": pa.array([], pa.int64()),
                "count_a": pa.array([], pa.int64()),
                "count_b": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or "name_a" not in group.column_names:
            return empty
        # exact pair dedup in C++ — counts are per-value constants, so
        # min() just picks the shared value
        g = group.group_by(["name_a", "name_b"]).aggregate(
            [("count_a", "min"), ("count_b", "min")]
        )
        dist = levenshtein_pairs(
            g["name_a"].combine_chunks(), g["name_b"].combine_chunks()
        )
        keep = dist <= max_dist
        if not keep.any():
            return empty
        sel = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "name_a": g["name_a"].take(sel),
                "name_b": g["name_b"].take(sel),
                "dist": pa.array(dist[keep], pa.int64()),
                "count_a": g["count_a_min"].take(sel).cast(pa.int64()),
                "count_b": g["count_b_min"].take(sel).cast(pa.int64()),
            }
        )

    return (
        distinct.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby("bucket2")
        .map_groups(verify, batch_format="pyarrow")
    )


def entity_clusters(
    ds: ray.data.Dataset,
    column: str,
    *,
    min_jw: float = 0.0,
    max_dist: int = 2,
    max_len: int = 64,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """End-to-end entity resolution over a key column: candidate pairs
    from the Levenshtein band, Jaro-Winkler-scored and thresholded
    (:func:`jaro_winkler_join`), closed into clusters by connected
    components (``stages/graph.py`` min-label propagation) — every
    DISTINCT value receives the LEXICOGRAPHICALLY SMALLEST value of its
    cluster as canonical representative; unmatched values are singletons
    (their own representative).

    Output: one row per distinct value — ``(name, cluster, cnt)`` with
    ``cnt`` the value's corpus row count.

    Node ids are sorted-name ranks, so the min-label component id maps
    back to the min NAME — the representative choice is deterministic
    and total-order-stable.  The distinct-value set of a KEY column is
    bounded (the fuzzy-family contract: names, titles, codes — NOT free
    text), so the rank map builds driver-side from the same distinct
    reduction the join already runs; the component pass auto-selects the
    driver or distributed plan on edge volume.
    """
    from .agg import bucket_groupby_sum
    from .graph import connected_components

    distinct = bucket_groupby_sum(
        ds.map_batches(
            lambda b: b.select([column]).drop_null(), batch_format="pyarrow"
        ),
        keys=[column],
        sum_cols=[],
        count_col="cnt",
        n_buckets=n_buckets,
    ).take_all()
    names = sorted(r[column] for r in distinct)
    cnt = {r[column]: int(r["cnt"]) for r in distinct}
    rank = {n: i for i, n in enumerate(names)}

    pairs = jaro_winkler_join(
        ds,
        column,
        min_jw=min_jw,
        max_dist=max_dist,
        max_len=max_len,
        n_buckets=n_buckets,
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        u = [rank[x] for x in batch["name_a"].to_pylist()]
        v = [rank[x] for x in batch["name_b"].to_pylist()]
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    nodes = ray.data.from_arrow(
        pa.table({"id": pa.array(list(range(len(names))), pa.int64())})
    )
    cc = connected_components(edges, nodes, id_col="id").take_all()
    rep = {int(r["id"]): int(r["cluster_id"]) for r in cc}
    out_names = names
    out = pa.table(
        {
            "name": pa.array(out_names, pa.string()),
            "cluster": pa.array(
                [names[rep.get(rank[n], rank[n])] for n in out_names],
                pa.string(),
            ),
            "cnt": pa.array([cnt[n] for n in out_names], pa.int64()),
        }
    )
    return ray.data.from_arrow(out)
