"""Scale soak (BASELINE.md round-5): selected pipelines at sf0.1 AND
sf1 (10x data, from tools/gen_sf1.py) in ONE session/window; reports
wall ratios.  A query whose wall grows >>10x at 10x data has a
super-linear stage.

Usage: python tools/soak_sf1.py  [env: SOAK_NAMES=comma,list]
"""
import json
import os
import sys
import time

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as e

NAMES = os.environ.get("SOAK_NAMES", (
    "q2_min_cost_supplier,q21_waiting_suppliers,basket_rules,"
    "dedup_minhash_incremental,embedding_logreg,dedup_ngram,"
    "part_clustering_top,corpus_to_shards,hybrid_search_rrf,"
    "extract_then_dedup"
)).split(",")
qs = e.queries()


def consume(res):
    import pyarrow as pa

    import ray.data
    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


# hardware probe (the repo's throttle convention)
def burn():
    t0 = time.time()
    x = 0
    for i in range(30_000_000):
        x += i
    return time.time() - t0


out = {"burn_pre": round(burn(), 2), "queries": {}}
for name in NAMES:
    rec = {}
    base = os.environ.get("SOAK_BASE_DIR", "/root/testdata/sf0.1")
    big = os.environ.get("SOAK_DST", "/tmp/sf1")
    for sf, d in (("sf0.1", base), ("sf1", big)):
        t0 = time.time()
        try:
            n = consume(qs[name](d))
            rec[sf] = {"sec": round(time.time() - t0, 2), "rows": n}
        except Exception as ex:  # noqa: BLE001
            rec[sf] = {"err": f"{type(ex).__name__}: {ex}"[:200],
                       "sec": round(time.time() - t0, 2)}
    if "sec" in rec.get("sf0.1", {}) and "err" not in rec["sf0.1"] \
            and "err" not in rec.get("sf1", {}):
        rec["ratio"] = round(rec["sf1"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9), 2)
    out["queries"][name] = rec
    print(name, json.dumps(rec), flush=True)
out["burn_post"] = round(burn(), 2)
print(json.dumps(out))
with open("/tmp/soak_sf1.json", "w") as f:
    json.dump(out, f, indent=1)
ray.shutdown()
