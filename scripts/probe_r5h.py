"""Scale probe: the round-5 exact-join additions above fixture scale
(fresh 32-CPU session; recorded in BASELINE.md part 8) —

- q119 jaccard_join (prefix filtering) at 100k synthetic docs with a
  planted 20% near-dup rate, threshold 0.8;
- q120 edit_distance_join at 1M 16-hex keys with 10k planted
  distance-1 pairs (deletion fan-out 17x -> ~17M exchange rows).

Deterministic synthetic data (splitmix64); no external data."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa  # noqa: E402
import ray.data as rd  # noqa: E402

from gxdindexer_ray.ops.dedup import jaccard_join  # noqa: E402
from gxdindexer_ray.ops.relational import _splitmix64  # noqa: E402
from gxdindexer_ray.ops.textops import edit_distance_join  # noqa: E402


def steal(dt=0.5):
    def snap():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(v), v[7]
    a, b = snap()
    time.sleep(dt)
    c, d = snap()
    return 100.0 * (d - b) / max(1, (c - a))


results = {"steal_pct_start": round(steal(), 2)}

# --- q119 jaccard_join: 100k docs, 20% near-dups, tau=0.8 ------------------
N_DOC, VOCAB, DOCLEN = 100_000, 50_000, 60


def _doc_words(d: int) -> np.ndarray:
    # hash the doc id BEFORE adding the position index — ``d + arange``
    # alone makes consecutive docs share 59/60 splitmix inputs (shifted
    # near-identical docs: every neighbor pair qualifies)
    h = _splitmix64(_splitmix64(np.array([d], np.uint64))
                    + np.arange(DOCLEN, dtype=np.uint64))
    return h % np.uint64(VOCAB)


def mk_docs(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = []
    for d in i:
        words = _doc_words(d)
        if d % 5 == 4:  # near-dup of doc d-1: mutate the last 4 words
            mut = words[-4:]
            words = _doc_words(d - 1)
            words[-4:] = mut
        texts.append(" ".join("w%d" % w for w in words))
    return pa.table({"doc_id": pa.array(i), "text": pa.array(texts)})


t0 = time.time()
out = jaccard_join(
    rd.range(N_DOC).map_batches(mk_docs, batch_format="pyarrow"),
    threshold=0.8, n_buckets=256)
n_pairs = len(out)
t_j = time.time() - t0
results["jaccard_join_100k_docs_tau08"] = {
    "sec": round(t_j, 2), "docs_per_s": int(N_DOC / t_j),
    "pairs": int(n_pairs)}
print("jaccard_join", results["jaccard_join_100k_docs_tau08"])

# --- q120 edit_distance_join: 1M 16-hex keys, 10k planted 1-edits ----------
N_K, N_PLANT = 1_000_000, 10_000


def mk_keys(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(i.view(np.uint64))
    # planted pairs: ids N_K..N_K+N_PLANT-1 are base key (id - N_K) with
    # the first hex char deleted (distance 1); everything else random
    base = np.where(i >= N_K, i - N_K, i).astype(np.int64)
    hb = _splitmix64(base.view(np.uint64))
    keys = np.char.zfill(np.char.mod("%x", hb), 16).astype(object)
    planted = np.flatnonzero(i >= N_K)
    for p in planted:
        keys[p] = keys[p][1:]
    return pa.table({"doc_id": pa.array(i),
                     "k": pa.array(keys.tolist(), pa.string())})


t0 = time.time()
out = edit_distance_join(
    rd.range(N_K + N_PLANT).map_batches(mk_keys, batch_format="pyarrow"),
    id_col="doc_id", str_col="k", max_dist=1, n_buckets=256).count()
t_e = time.time() - t0
results["edit_distance_join_1M_keys_d1"] = {
    "sec": round(t_e, 2), "keys_per_s": int((N_K + N_PLANT) / t_e),
    "pairs": int(out)}
print("edit_distance_join", results["edit_distance_join_1M_keys_d1"])

results["steal_pct_end"] = round(steal(), 2)
import json  # noqa: E402

print(json.dumps(results))
ray.shutdown()
