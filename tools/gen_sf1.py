"""Deterministic sf1 replica generator for the scale soak (BASELINE.md
round-5): R copies of a source sf directory with key-space offsets so
every foreign key stays consistent and all key cardinalities scale Rx.
region/nation stay fixed (TPC-H micro-dims).  Replica r>0 content is
perturbed (documents word-shuffled, embeddings noise-jittered) so the
dedup/similarity family sees a realistic Rx corpus, not exact clones.

Usage: python tools/gen_sf1.py  [env: SOAK_SRC, SOAK_DST, SOAK_R]
"""
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SOAK_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SOAK_DST", "/tmp/sf1")
R = int(os.environ.get("SOAK_R", "10"))
os.makedirs(DST, exist_ok=True)

# per-table: columns offset by replica * span(col's key domain)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# spans shared across tables so FKs line up (orders.o_custkey uses the
# customer span, lineitem.l_partkey the part span, ...)
span_of = {}
for t in ["customer", "supplier", "part", "orders", "events",
          "documents", "embeddings"]:
    tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
    key = OFFSETS[t][0]
    span_of[key] = int(pc.max(tab[key]).as_py()) + 1
span_of["o_custkey"] = span_of["c_custkey"]
span_of["l_orderkey"] = span_of["o_orderkey"]
span_of["l_partkey"] = span_of["p_partkey"]
span_of["l_suppkey"] = span_of["s_suppkey"]
span_of["user_id"] = span_of["event_id"]  # user ids offset by own domain
# user_id span should be its own domain:
ev = pq.read_table(os.path.join(SRC, "events.parquet"), columns=["user_id"])
span_of["user_id"] = int(pc.max(ev["user_id"]).as_py()) + 1

for t in ["region", "nation"]:
    tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
    pq.write_table(tab, os.path.join(DST, f"{t}.parquet"))
    print(t, tab.num_rows)

import numpy as np


def perturb(t, tab, r):
    """Replica r>0 content perturbation so the dedup/similarity family
    sees a realistic 10x corpus instead of exact clones: documents get a
    deterministic word shuffle (destroys shingles, preserves length and
    vocabulary), embeddings get seeded gaussian noise."""
    if r == 0:
        return tab
    if t == "documents":
        rng = np.random.default_rng(1000 + r)
        texts = tab["text"].to_pylist()
        shuf = []
        for s in texts:
            w = s.split(" ")
            rng.shuffle(w)
            shuf.append(" ".join(w))
        return tab.set_column(
            tab.schema.get_field_index("text"), "text",
            pa.array(shuf, pa.string()),
        )
    if t == "embeddings":
        rng = np.random.default_rng(2000 + r)
        emb = tab["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // tab.num_rows
        noisy = (flat + rng.normal(0, 0.05, len(flat))).astype(np.float32)
        col = pa.ListArray.from_arrays(
            pa.array(range(0, len(flat) + d, d), pa.int32()),
            pa.array(noisy, pa.float32()),
        )
        return tab.set_column(
            tab.schema.get_field_index("embedding"), "embedding", col
        )
    return tab


for t, keys in OFFSETS.items():
    base = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
    reps = []
    for r in range(R):
        tab = perturb(t, base, r)
        for k in keys:
            typ = tab.schema.field(k).type
            off = pa.scalar(r * span_of[k], pa.int64())
            tab = tab.set_column(
                tab.schema.get_field_index(k), k,
                pc.add(tab[k].cast(pa.int64()), off).cast(typ),
            )
        reps.append(tab)
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(DST, f"{t}.parquet"),
                   row_group_size=262144)
    print(t, out.num_rows)
print("done ->", DST)
