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
from gxdindexer_ray.ops.textops import exact_dedup_incremental
from gxdindexer_ray.ops.dedup import incremental_near_dup

VOCAB, DOC_TOKENS = 50_000, 60

def corpus(n_docs, offset=0, ns=0, copy_rate=0):
    """ns: text-source namespace; copy_rate: every (1/copy_rate)-th doc
    copies the text of the same-index doc in namespace 0 (the prior)."""
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = ids + ns
        if copy_rate:
            src = np.where(ids % copy_rate == 0, ids, src)
        pos = (src[:, None] * DOC_TOKENS + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64).reshape(len(ids), DOC_TOKENS)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(r) for r in toks.reshape(len(ids), DOC_TOKENS)]
        return pa.table({"doc_id": pa.array(ids + offset),
                         "text": pa.array(texts, pa.string())})
    return rd.range(n_docs, override_num_blocks=64).map_batches(gen, batch_format="pyarrow")

def steal():
    def snap():
        v=[int(x) for x in open('/proc/stat').readline().split()[1:]]
        return sum(v), v[7]
    a,b=snap(); time.sleep(0.5); c,d=snap()
    return 100.0*(d-b)/max(1,(c-a))

for n in (200_000, 400_000):
    # prior: docs with source pos ids (every 10th new doc copies prior text)
    prior = corpus(n, offset=0, ns=0).materialize()
    new = corpus(n, offset=n, ns=2 * 10**9, copy_rate=10).materialize()
    planted = (n + 9) // 10
    print(f"--- prior {n} + new {n} docs, steal {steal():.2f}% ---")
    t0=time.time()
    out = exact_dedup_incremental(new, prior)
    surv = sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow"))
    dt=time.time()-t0
    print(f"exact_dedup_incremental: {dt:.1f}s  {2*n/dt:,.0f} docs/s  "
          f"survivors={surv:,} (planted-clean {n - planted:,})")
    t0=time.time()
    fl = incremental_near_dup(new, prior, threshold=0.9)
    nf = len(fl) if hasattr(fl, "__len__") and not hasattr(fl, "iter_batches") else \
        sum(b.num_rows for b in fl.iter_batches(batch_format="pyarrow"))
    dt=time.time()-t0
    print(f"incremental_near_dup: {dt:.1f}s  {2*n/dt:,.0f} docs/s  "
          f"flagged={nf:,} (planted {planted:,})")
ray.shutdown()
