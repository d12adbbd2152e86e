"""Approximate-nearest-neighbor search over an embedding column.

Two paths, both Ray-Data-first:

- **brute_force_topk** — the exact baseline: the (small) query matrix is
  broadcast ONCE via ``ray.put``; every corpus block computes a
  (batch × queries) cosine matmul and emits its LOCAL top-k rows per query;
  a final tiny ``groupby(query_id).map_groups`` reduces local top-ks to the
  global top-k.  Corpus-side work is a streaming single pass — nothing
  materializes — so this scales to any corpus size; cost is O(N·Q·d) flops.
- **IVFIndex** — the scale path: a deterministic k-means (fixed seed, fixed
  iterations, sample-based init) builds ``n_cells`` centroids; vectors are
  assigned to their nearest centroid in a ``map_batches`` pass; queries probe
  only the ``nprobe`` nearest cells, pruning ~(1 - nprobe/n_cells) of the
  corpus before the matmul.  The assignment column doubles as a partition
  key for co-locating cells at write time.

Output schema (both): (query_id:int64, neighbor_id:int64, rank:int32,
cosine:float64 rounded to 6dp).  Ties broken by neighbor_id ascending, so
results are deterministic at any parallelism level and SQL-replicable
(DuckDB ``list_cosine_similarity`` + ``row_number()``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..arrays import ints_to_numpy, list_to_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_rows(
    sims: np.ndarray,
    ids: np.ndarray,
    query_ids: np.ndarray,
    k: int,
) -> pa.Table:
    """(Q, n) score matrix → local top-k rows per query, id-ascending ties."""
    out_q, out_n, out_s = [], [], []
    n = sims.shape[1]
    kk = min(k, n)
    for qi in range(sims.shape[0]):
        row = sims[qi]
        # lexsort: primary -score, secondary id — deterministic ties
        order = np.lexsort((ids, -row))[:kk]
        out_q.extend([query_ids[qi]] * len(order))
        out_n.extend(ids[order].tolist())
        out_s.extend(row[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine_raw": pa.array(out_s, pa.float64()),
        }
    )


def _final_topk(group: pa.Table, *, k: int) -> pa.Table:
    ids = ints_to_numpy(group["neighbor_id"], np.int64)
    sims = group["cosine_raw"].to_numpy(zero_copy_only=False).astype(np.float64)
    qids = group["query_id"].to_pylist()
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "query_id": pa.array([qids[i] for i in order], pa.int64()),
            "neighbor_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int32()),
            "cosine": pa.array(np.round(sims[order], 6), pa.float64()),
        }
    )


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    dtype=np.float32,
) -> ray.data.Dataset:
    """Exact cosine top-k of every query against the full corpus (streamed).

    ``dtype``: float32 is the production choice (half the bandwidth/flops);
    float64 makes results bit-comparable to a double-precision SQL oracle.
    """
    qn = _normalize(np.asarray(queries, dtype=dtype))
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((qn, qids))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, qi = ray.get(qref)
        ids = ints_to_numpy(batch[id_col], np.int64)
        vecs = _normalize(list_to_matrix(batch[vec_col], dtype))
        sims = (q @ vecs.T).astype(np.float64)  # (Q, b)
        if exclude_self:
            mask = qi[:, None] == ids[None, :]
            sims[mask] = -np.inf
        return _topk_rows(sims, ids, qi, k)

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index
# ---------------------------------------------------------------------------


def deterministic_kmeans(
    sample: np.ndarray, n_cells: int, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample — fixed seed, fixed
    iteration count, so centroids are identical on every run/cluster size."""
    x = _normalize(np.asarray(sample, dtype=np.float32))
    rng = np.random.RandomState(seed)
    init = rng.choice(len(x), size=min(n_cells, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _normalize(c)
    return c


class IVFIndex:
    """IVF-flat ANN over a Dataset's embedding column.

    ``build`` samples the corpus (``ds.limit`` on a column-pruned scan) to fit
    centroids, then adds a ``cell`` column in one streamed pass.  ``search``
    probes the ``nprobe`` closest cells: a cheap vectorized filter inside
    ``map_batches`` drops ~(1 - nprobe/n_cells) of every block before the
    matmul, which is the same pruning a partitioned-by-cell layout would get
    from file skipping at 100 TB scale.
    """

    def __init__(
        self,
        n_cells: int = 16,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
        sample_size: int = 2048,
    ):
        self.n_cells = n_cells
        self.vec_col = vec_col
        self.id_col = id_col
        self.seed = seed
        self.sample_size = sample_size
        self.centroids: np.ndarray | None = None
        self.assigned: ray.data.Dataset | None = None

    def build(self, ds: ray.data.Dataset) -> "IVFIndex":
        # The k-means sample must be a DETERMINISTIC function of the corpus:
        # k-means init is permutation-sensitive, and both `limit()` row
        # MEMBERSHIP (which rows survive) and `take_all()` row ORDER follow
        # block arrival order, which varies run to run.  Small corpora take
        # everything; larger ones hash-filter by id (a deterministic set),
        # then sort by id and truncate — membership and order both fixed.
        proj = ds.select_columns([self.id_col, self.vec_col])
        n_total = proj.count()
        if n_total <= self.sample_size:
            rows = proj.take_all()
        else:
            from ..hashing import splitmix_bucket

            # target ~2× the sample size so the truncation almost never
            # discards more than half; still deterministic either way
            buckets = max(1, n_total // (2 * self.sample_size))
            id_col = self.id_col

            def hash_filter(batch):
                import pyarrow as _pa

                ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
                    np.uint64
                )
                mask = splitmix_bucket(ids, buckets) == 0
                return batch.filter(_pa.array(mask))

            rows = proj.map_batches(
                hash_filter, batch_format="pyarrow"
            ).take_all()
        rows.sort(key=lambda r: r[self.id_col])
        rows = rows[: self.sample_size]
        sample = np.asarray([r[self.vec_col] for r in rows], dtype=np.float32)
        self.centroids = deterministic_kmeans(sample, self.n_cells, seed=self.seed)
        cref = ray.put(self.centroids)
        vec_col, id_col = self.vec_col, self.id_col

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = _normalize(
                list_to_matrix(batch[vec_col], np.float32)
            )
            cells = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
            return batch.append_column("cell", pa.array(cells, pa.int32()))

        self.assigned = ds.map_batches(assign, batch_format="pyarrow")
        return self

    def write(self, path: str) -> "IVFIndex":
        """Persist the index: vectors partitioned by cell (one directory per
        cell → probed-cell reads skip every other file at search time) plus
        a centroids sidecar.

        Writing FREEZES the index: subsequent ``search()`` calls default to
        the persisted files (see ``search``'s ``prefer_persisted``), so
        mutate-after-write on ``self.assigned`` is not served — pass
        ``prefer_persisted=False`` to search the live assignment."""
        import json
        import os

        assert self.assigned is not None and self.centroids is not None
        self.assigned.write_parquet(path, partition_cols=["cell"])
        with open(os.path.join(path, "_centroids.json"), "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "vec_col": self.vec_col,
                    "id_col": self.id_col,
                    "n_cells": self.n_cells,
                },
                f,
            )
        # a written index defaults to pruned (probed-cells-only) search
        self._path = path
        return self

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        """Reopen a persisted index WITHOUT reading the vectors — only the
        centroids sidecar; ``search_persisted`` then reads just the probed
        cell partitions."""
        import json
        import os

        with open(os.path.join(path, "_centroids.json")) as f:
            meta = json.load(f)
        idx = cls(
            meta["n_cells"], vec_col=meta["vec_col"], id_col=meta["id_col"]
        )
        idx.centroids = np.asarray(meta["centroids"], dtype=np.float32)
        idx._path = path
        return idx

    def search_persisted(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> ray.data.Dataset:
        """Search a persisted index reading ONLY the probed cells' files —
        the partition pruning a 100 TB corpus needs (union of per-cell
        scans; ~(1 - nprobe/n_cells) of the data never leaves storage)."""
        import os

        assert self.centroids is not None and getattr(self, "_path", None)
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        probe_cells = sorted(
            {
                int(c)
                for row in np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
                for c in row
            }
        )
        import glob

        # expand probed cell dirs to files (read_parquet treats list
        # entries as files, not directories)
        parts = [
            f
            for c in probe_cells
            for f in glob.glob(
                os.path.join(self._path, f"cell={c}", "*.parquet")
            )
        ]
        ds = ray.data.read_parquet(parts)
        pruned = ds.map_batches(self._reassign_cells, batch_format="pyarrow")
        # build the search plan against the pruned scan, then RESTORE the
        # previous assignment — otherwise a later search() on this index
        # would silently scan only the cells this call probed
        prev = self.assigned
        self.assigned = pruned
        try:
            return self._search_assigned(
                queries, query_ids, k=k, nprobe=nprobe,
                exclude_self=exclude_self,
            )
        finally:
            self.assigned = prev

    def _reassign_cells(self, batch):
        """Normalize the cell column: the hive-partition read restores it as
        a STRING ('5'); downstream filters need int32."""
        import pyarrow as pa

        if "cell" in batch.column_names:
            i = batch.column_names.index("cell")
            return batch.set_column(
                i, "cell", batch["cell"].cast(pa.int32())
            )
        vecs = _normalize(
            list_to_matrix(batch[self.vec_col], np.float32)
        )
        cells = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells, pa.int32()))

    def search(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        nprobe: int = 4,
        exclude_self: bool = True,
        prefer_persisted: bool | None = None,
    ) -> ray.data.Dataset:
        """Top-k search.  On a persisted index (``write()`` or ``load()``)
        this DEFAULTS to the pruned path — only the probed cells' parquet
        files are read.  The in-memory full-scan path (compute-side cell
        filter, every block read) is a small-corpus/test convenience only;
        at 100 TB the persisted path is the only valid plan.

        ``prefer_persisted`` makes the plan choice explicit: ``write()``
        FREEZES the index — after it, searches read the written files, so
        mutations to ``self.assigned`` made after ``write()`` are NOT
        visible unless you pass ``prefer_persisted=False`` (which serves
        the live in-memory assignment instead)."""
        use_persisted = (
            prefer_persisted
            if prefer_persisted is not None
            else bool(getattr(self, "_path", None))
        )
        if use_persisted:
            if not getattr(self, "_path", None):
                raise ValueError(
                    "prefer_persisted=True but the index was never written/"
                    "loaded — call write(path) or load(path) first"
                )
            return self.search_persisted(
                queries, query_ids, k=k, nprobe=nprobe,
                exclude_self=exclude_self,
            )
        return self._search_assigned(
            queries, query_ids, k=k, nprobe=nprobe, exclude_self=exclude_self
        )

    def _search_assigned(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        nprobe: int = 4,
        exclude_self: bool = True,
    ) -> ray.data.Dataset:
        assert self.assigned is not None, "call build() first"
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        qids = np.asarray(query_ids, dtype=np.int64)
        # (Q, nprobe) cells each query probes
        probe = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        qref = ray.put((qn, qids, probe))
        vec_col, id_col = self.vec_col, self.id_col

        def local_topk(batch: pa.Table) -> pa.Table:
            q, qi, pr = ray.get(qref)
            cells = batch["cell"].to_numpy(zero_copy_only=False)
            ids = ints_to_numpy(batch[id_col], np.int64)
            vecs = _normalize(
                list_to_matrix(batch[vec_col], np.float32)
            )
            parts = []
            for qidx in range(len(q)):
                keep = np.isin(cells, pr[qidx])
                if exclude_self:
                    keep &= ids != qi[qidx]
                if not keep.any():
                    continue
                sims = (vecs[keep] @ q[qidx]).astype(np.float64)[None, :]
                parts.append(_topk_rows(sims, ids[keep], qi[qidx : qidx + 1], k))
            if not parts:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "cosine_raw": pa.array([], pa.float64()),
                    }
                )
            return pa.concat_tables(parts)

        local = self.assigned.map_batches(local_topk, batch_format="pyarrow")
        return local.groupby("query_id").map_groups(
            _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
        )


# ---------------------------------------------------------------------------
# PQ (product quantization) — compressed ANN codes
# ---------------------------------------------------------------------------


def _pq_sample(
    ds: ray.data.Dataset, id_col: str, vec_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic corpus sample (same contract as IVFIndex.build: id
    hash-filter → sort by id → truncate — membership and order fixed)."""
    proj = ds.select_columns([id_col, vec_col])
    n_total = proj.count()
    if n_total <= sample_size:
        rows = proj.take_all()
    else:
        from ..hashing import splitmix_bucket

        buckets = max(1, n_total // (2 * sample_size))

        def hash_filter(batch):
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.filter(pa.array(splitmix_bucket(ids, buckets) == 0))

        rows = proj.map_batches(hash_filter, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:sample_size]
    return np.asarray([r[vec_col] for r in rows], dtype=np.float32)


def _pq_kmeans_subspace(
    x: np.ndarray, ks: int, seed: int, iters: int = 10
) -> np.ndarray:
    """Euclidean Lloyd's on one subspace slice (NOT normalized — subvector
    geometry is euclidean even when the full vectors are cosine-normalized);
    fixed seed + iteration count → deterministic codebooks."""
    rng = np.random.RandomState(seed)
    init = rng.choice(len(x), size=min(ks, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c


class PQIndex:
    """Product-quantized ANN: vectors compress to ``m`` uint8 codes
    (1 byte per subspace — 64× smaller than float64 at dim 64/m 8) and
    queries score by Asymmetric Distance Computation: per query, one
    (m × ks) inner-product table against the codebooks, then scores are
    pure TABLE LOOKUPS summed over subspaces — no float vector ever
    leaves the build pass.

    Exact inner-product decomposition: on normalized vectors,
    ``q·x ≈ Σ_m q_m · c_m[code_m(x)]`` with error bounded by the
    per-subspace quantization residual — recall vs the brute-force oracle
    is asserted in tests, and the seeded build + float32 table arithmetic
    make results deterministic (fixture-pinnable).

    Scale shape: the encode is one streamed pass (codes are ~m bytes/row);
    search is one streamed pass over the CODE column only + the standard
    local-top-k → tiny final reduce.  Compose with IVF cells for the
    probe-pruned variant (orthogonal: PQ compresses payload, IVF prunes
    rows)."""

    def __init__(
        self,
        m: int = 8,
        ks: int = 32,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
        sample_size: int = 2048,
    ):
        self.m = m
        self.ks = ks
        self.vec_col = vec_col
        self.id_col = id_col
        self.seed = seed
        self.sample_size = sample_size
        self.codebooks: np.ndarray | None = None  # (m, ks, d/m)
        self.encoded: ray.data.Dataset | None = None
        self._source: ray.data.Dataset | None = None  # for exact rerank

    def build(self, ds: ray.data.Dataset) -> "PQIndex":
        sample = _normalize(
            _pq_sample(ds, self.id_col, self.vec_col, self.sample_size)
        )
        d = sample.shape[1]
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        sub = d // self.m
        self.codebooks = np.stack(
            [
                _pq_kmeans_subspace(
                    sample[:, i * sub : (i + 1) * sub],
                    self.ks,
                    self.seed + i,
                )
                for i in range(self.m)
            ]
        )
        cref = ray.put(self.codebooks)
        vec_col, id_col, m = self.vec_col, self.id_col, self.m

        def encode(batch: pa.Table) -> pa.Table:
            cb = ray.get(cref)
            vecs = _normalize(
                list_to_matrix(batch[vec_col], np.float32)
            )
            n, d_ = vecs.shape
            sub_ = d_ // m
            codes = np.empty((n, m), np.uint8)
            for i in range(m):  # bounded by m; interior fully vectorized
                x = vecs[:, i * sub_ : (i + 1) * sub_]
                d2 = (
                    (x**2).sum(axis=1)[:, None]
                    - 2.0 * (x @ cb[i].T)
                    + (cb[i] ** 2).sum(axis=1)[None, :]
                )
                codes[:, i] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "code": pa.array(
                        list(codes.tobytes()[j * m : (j + 1) * m]
                             for j in range(n)),
                        pa.binary(m),
                    ),
                }
            )

        self.encoded = ds.map_batches(encode, batch_format="pyarrow")
        self._source = ds
        return self

    def search(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        *,
        k: int = 10,
        exclude_self: bool = True,
        rerank: int = 0,
    ) -> ray.data.Dataset:
        """``rerank = 0``: pure ADC scores over codes.  ``rerank = o > 0``:
        the classic two-pass — ADC shortlists ``k·o`` candidates per query
        (bounded driver state: Q·k·o ids), then ONE exact-cosine pass over
        the original vector column scores ONLY shortlisted pairs, so the
        full-precision matmul touches an o·k-row fraction of the corpus
        per query while recall approaches brute force."""
        assert self.codebooks is not None and self.encoded is not None
        if rerank:
            short = self.search(
                queries, query_ids, k=k * rerank,
                exclude_self=exclude_self, rerank=0,
            ).take_all()  # bounded: Q * k * rerank rows
            per_q: dict = {}
            for r in short:
                per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
            qn_ = _normalize(np.asarray(queries, dtype=np.float64))
            qi_ = np.asarray(query_ids, np.int64)
            sets = {qid: np.sort(np.asarray(ids, np.int64))
                    for qid, ids in per_q.items()}
            sref = ray.put((qn_, qi_, sets))
            vec_col, id_col = self.vec_col, self.id_col
            assert self._source is not None

            def exact_local(batch: pa.Table) -> pa.Table:
                qn2, qi2, sh = ray.get(sref)
                ids = ints_to_numpy(batch[id_col], np.int64)
                vecs = _normalize(
                    list_to_matrix(batch[vec_col], np.float64)
                )
                sims = (qn2 @ vecs.T).astype(np.float64)
                for qi3, qid in enumerate(qi2):  # bounded by Q
                    allow = sh.get(int(qid))
                    if allow is None:
                        sims[qi3, :] = -np.inf
                        continue
                    pos = np.searchsorted(allow, ids)
                    pos = np.clip(pos, 0, len(allow) - 1)
                    sims[qi3, ~(allow[pos] == ids)] = -np.inf
                return _topk_rows(sims, ids, qi2, k)

            local = self._source.map_batches(
                exact_local, batch_format="pyarrow"
            )
            return local.groupby("query_id").map_groups(
                _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
            )
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        Q, d = qn.shape
        m, ks = self.m, self.ks
        sub = d // m
        # (Q, m, ks) inner-product lookup tables — float32 end to end
        tables = np.einsum(
            "qms,mks->qmk",
            qn.reshape(Q, m, sub),
            self.codebooks,
            dtype=np.float32,
        ).astype(np.float32)
        tref = ray.put((tables, np.asarray(query_ids, np.int64)))
        id_col = self.id_col

        def local_topk(batch: pa.Table) -> pa.Table:
            tabs, qi = ray.get(tref)
            ids = ints_to_numpy(batch[id_col], np.int64)
            code_col = batch["code"]
            if isinstance(code_col, pa.ChunkedArray):
                code_col = code_col.combine_chunks()
            buf = np.frombuffer(
                code_col.buffers()[-1], np.uint8
            )[code_col.offset * m : (code_col.offset + len(code_col)) * m]
            codes = buf.reshape(-1, m).astype(np.int64)  # (b, m)
            # ADC: scores[q, b] = Σ_i tabs[q, i, codes[b, i]]
            b = codes.shape[0]
            sims = np.zeros((len(qi), b), np.float32)
            for i in range(m):  # bounded by m; gather is vectorized
                sims += tabs[:, i, codes[:, i]]
            sims = sims.astype(np.float64)
            if exclude_self:
                sims[qi[:, None] == ids[None, :]] = -np.inf
            return _topk_rows(sims, ids, qi, k)

        local = self.encoded.map_batches(local_topk, batch_format="pyarrow")
        return local.groupby("query_id").map_groups(
            _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
        )


# ---------------------------------------------------------------------------
# kNN label consistency (mislabel / noisy-annotation detection)
# ---------------------------------------------------------------------------


def label_consistency(
    ds: ray.data.Dataset,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    dtype=np.float64,
    batch_size: int = 512,
) -> ray.data.Dataset:
    """Per-vector kNN label agreement — the Confident-Learning-style
    noisy-label screen: for every vector, how many of its ``k`` exact
    cosine nearest neighbors (excluding itself, ties broken by id) share
    its label.  ``suspect`` flags rows where agreement is below half of
    the effective neighbor count — the rows a labeling pass should
    re-examine.

    Shape: the (id, label, L2-normalized matrix) corpus ships ONCE via
    plasma (one copy per node, zero-copy reads per task — the same
    broadcast discipline as the ANN query matrix) and the corpus streams
    against it as the query side: one float64 matmul + per-row lexsort
    per batch, no exchange at all.  This is the EXACT baseline — at
    corpus sizes past the broadcast budget, the scale path is the IVF
    cell-probe (``IVFIndex.search`` machinery): probe the query's nprobe
    cells and rank within, trading exactness for recall exactly as
    ``ann_ivf`` documents.

    ``dtype`` float64 keeps ranking bit-comparable to a double-precision
    SQL oracle (the ``ann_topk`` precedent).
    """
    from ..cluster import collect_table

    full = collect_table(
        ds.select_columns([id_col, label_col, vec_col])
    )
    if full is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    label_col: pa.array([], pa.int32()),
                    "n_agree": pa.array([], pa.int64()),
                    "suspect": pa.array([], pa.int64()),
                }
            )
        )
    # corpus columns ordered by ascending id ⇒ a STABLE argsort over -sims
    # breaks cosine ties by id asc with no per-row Python
    full = full.sort_by([(id_col, "ascending")])
    ids_all = ints_to_numpy(full[id_col], np.int64)
    labels_all = ints_to_numpy(full[label_col], np.int64)
    mat = np.ascontiguousarray(
        _normalize(list_to_matrix(full[vec_col], dtype))
    )
    corpus_ref = ray.put((ids_all, labels_all, mat))
    k_eff = min(k, len(ids_all) - 1)

    def score(batch: pa.Table) -> pa.Table:
        cids, clabs, cmat = ray.get(corpus_ref)
        ids = ints_to_numpy(batch[id_col], np.int64)
        labs = ints_to_numpy(batch[label_col], np.int64)
        vecs = _normalize(list_to_matrix(batch[vec_col], dtype))
        sims = (vecs @ cmat.T).astype(np.float64)  # (b, N)
        sims[ids[:, None] == cids[None, :]] = -np.inf  # exclude self
        if k_eff > 0:
            order = np.argsort(-sims, axis=1, kind="stable")[:, :k_eff]
            n_agree = np.sum(
                clabs[order] == labs[:, None], axis=1
            ).astype(np.int64)
        else:
            n_agree = np.zeros(len(ids), np.int64)
        suspect = (2 * n_agree < k_eff).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                label_col: batch[label_col],
                "n_agree": pa.array(n_agree, pa.int64()),
                "suspect": pa.array(suspect, pa.int64()),
            }
        )

    # batch_size bounds the per-task similarity matrix at batch×N×8 bytes
    # (the corpus dimension N is already capped by the broadcast budget)
    return ds.select_columns([id_col, label_col, vec_col]).map_batches(
        score, batch_format="pyarrow", batch_size=batch_size
    ).sort(id_col)
