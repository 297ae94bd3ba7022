import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
import ray.data as rd
from gxdindexer_ray.ops.relational import _splitmix64
from gxdindexer_ray.ops.dedup import dedup_corpus

VOCAB, DOC_TOKENS = 50_000, 60

def corpus(n_docs, dup_rate=5):
    """Every dup_rate-th doc is an EXACT copy of its predecessor (near-dup
    clusters of size 2 at j=1.0)."""
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.where(ids % dup_rate == dup_rate - 1, ids - 1, ids)
        pos = (src[:, None] * DOC_TOKENS + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64).reshape(len(ids), DOC_TOKENS)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(r) for r in toks.reshape(len(ids), DOC_TOKENS)]
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})
    return rd.range(n_docs, override_num_blocks=64).map_batches(gen, batch_format="pyarrow")

def steal():
    def snap():
        v=[int(x) for x in open('/proc/stat').readline().split()[1:]]
        return sum(v), v[7]
    a,b=snap(); time.sleep(0.5); c,d=snap()
    return 100.0*(d-b)/max(1,(c-a))

for n in (200_000, 400_000):
    docs = corpus(n).materialize()
    planted_losers = n // 5
    print(f"--- dedup_corpus {n:,} docs (20% planted near-dups), steal {steal():.2f}% ---")
    t0=time.time()
    kept = dedup_corpus(docs, threshold=0.9)
    surv = sum(b.num_rows for b in kept.iter_batches(batch_format="pyarrow"))
    dt=time.time()-t0
    print(f"dedup_corpus: {dt:.1f}s  {n/dt:,.0f} docs/s  "
          f"survivors={surv:,} (planted-distinct {n - planted_losers:,})")
ray.shutdown()
