"""Scale probe: q86 frequent-terms, q87 k-means, q88 SemDeDup above
fixture scale (fresh 32-CPU session; recorded in BASELINE.md)."""
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

from gxdindexer_ray.ops.relational import _splitmix64  # noqa: E402
from gxdindexer_ray.ops.similarity import kmeans_cluster, semdedup  # noqa: E402
from gxdindexer_ray.ops.textops import frequent_terms  # noqa: E402

VOCAB, DOC_TOKENS = 50_000, 60


def steal_pct(dt=0.5):
    def snap():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]
    t0, s0 = snap()
    time.sleep(dt)
    t1, s1 = snap()
    return 100.0 * (s1 - s0) / max(1, (t1 - t0))


def corpus(n_docs):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (ids[:, None] * DOC_TOKENS + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64).reshape(len(ids), DOC_TOKENS)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(r) for r in toks.reshape(len(ids), DOC_TOKENS)]
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts, pa.string())})
    return (rd.range(n_docs, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


def vectors(n, d=64, n_clusters=256):
    """Clustered vectors (center + noise) so k-means/semdedup do real
    work; every 10th vector is a near-copy of its predecessor (planted
    semantic dups)."""
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.where(ids % 10 == 9, ids - 1, ids)
        cpos = (base[:, None] % n_clusters * d + np.arange(d)[None, :]).ravel()
        c = (_splitmix64(cpos.view(np.uint64)).astype(np.float64)
             / 2.0 ** 63 - 1.0)
        npos = (base[:, None] * d + np.arange(d)[None, :]).ravel() + 10 ** 12
        nz = (_splitmix64(npos.view(np.uint64)).astype(np.float64)
              / 2.0 ** 63 - 1.0) * 0.1
        dup = (ids[:, None] * d + np.arange(d)[None, :]).ravel() + 2 * 10 ** 12
        dz = (_splitmix64(dup.view(np.uint64)).astype(np.float64)
              / 2.0 ** 63 - 1.0) * 1e-4
        v = (c + nz + dz).astype(np.float32).reshape(len(ids), d)
        offs = pa.array(np.arange(0, (len(ids) + 1) * d, d, dtype=np.int32))
        return pa.table({"vec_id": pa.array(ids),
                         "embedding": pa.ListArray.from_arrays(
                             offs, pa.array(v.reshape(-1), pa.float32()))})
    return (rd.range(n, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


for n_docs in (200_000, 400_000):
    docs = corpus(n_docs).materialize()
    print(f"--- {n_docs} docs, steal {steal_pct():.2f}% ---")
    t0 = time.time()
    out = frequent_terms(docs, k=20, capacity=4096)
    dt = time.time() - t0
    print(f"frequent_terms: {dt:.1f}s  {n_docs/dt:,.0f} docs/s  "
          f"top1={out['term'].iloc[0]}:{out['cnt'].iloc[0]}")

# k sized so clusters stay ~2k rows: SemDeDup's within-cluster work is
# quadratic in cluster size BY DESIGN, so k must grow with the corpus
# (a k=64 run at 1M vectors means 16k-row clusters -> 2 GB matmuls per
# cluster; at 100 TB you would raise k into the millions)
for n_vec, kk in ((500_000, 256), (1_000_000, 512)):
    vecs = vectors(n_vec, n_clusters=kk).materialize()
    print(f"--- {n_vec} clustered vectors d=64, steal {steal_pct():.2f}% ---")
    t0 = time.time()
    labeled, _ = kmeans_cluster(vecs, k=kk, iters=5, sample_limit=8 * kk)
    n = sum(b.num_rows for b in labeled.iter_batches(batch_format="pyarrow"))
    dt = time.time() - t0
    print(f"kmeans (k={kk}, 5 rounds): {dt:.1f}s  {n_vec/dt:,.0f} vec/s  rows={n}")
    t0 = time.time()
    surv = semdedup(vecs, k=kk, iters=5, threshold=0.999,
                    sample_limit=8 * kk, n_buckets=32)
    n = sum(b.num_rows for b in surv.iter_batches(batch_format="pyarrow"))
    dt = time.time() - t0
    planted = n_vec - n_vec // 10
    print(f"semdedup (k={kk}): {dt:.1f}s  {n_vec/dt:,.0f} vec/s  "
          f"survivors={n} (planted-distinct={planted})")

ray.shutdown()
