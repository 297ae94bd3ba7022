"""Scale probe: q83 unigram LM score, q84 PQ encode/ADC+R search, and q85
source mixing far above fixture scale. Deterministic synthetic data;
fresh 32-CPU Ray session; results recorded in BASELINE.md round-5
section. Same corpus generator as scripts/probe_curation.py."""
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
from gxdindexer_ray.ops.sampling import source_mix  # noqa: E402
from gxdindexer_ray.ops.similarity import (brute_knn, pq_encode,  # noqa: E402
                                           pq_knn, pq_train)
from gxdindexer_ray.ops.textops import unigram_logprob_score  # noqa: E402

VOCAB = 50_000
DOC_TOKENS = 60


def steal_pct(dt=0.5):
    def snap():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]
    t0, s0 = snap()
    time.sleep(dt)
    t1, s1 = snap()
    return 100.0 * (s1 - s0) / max(1, (t1 - t0))


def corpus(n_docs: int):
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (ids[:, None] * DOC_TOKENS
               + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64).reshape(len(ids), DOC_TOKENS)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(row) for row in toks.reshape(len(ids), DOC_TOKENS)]
        return pa.table({
            "doc_id": pa.array(ids),
            "source": pa.array(np.char.add("src", (ids % 20).astype("U2"))),
            "text": pa.array(texts, pa.string())})
    return (rd.range(n_docs, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


def vectors(n: int, d: int = 64):
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (ids[:, None] * d + np.arange(d)[None, :]).ravel()
        v = (_splitmix64(pos.view(np.uint64)).astype(np.float64)
             / 2.0 ** 63 - 1.0).astype(np.float32).reshape(len(ids), d)
        offs = pa.array(np.arange(0, (len(ids) + 1) * d, d, dtype=np.int32))
        return pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.ListArray.from_arrays(
                offs, pa.array(v.reshape(-1), pa.float32()))})
    return (rd.range(n, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


def consume(ds):
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
    return n


for n_docs in (200_000, 400_000):
    docs = corpus(n_docs).materialize()
    print(f"--- {n_docs} docs, steal {steal_pct():.2f}% ---")

    t0 = time.time()
    rows = consume(unigram_logprob_score(docs, n_buckets=64))
    dt = time.time() - t0
    print(f"lm_score: {dt:.1f}s  {n_docs/dt:,.0f} docs/s  rows={rows}")

    t0 = time.time()
    w = {f"src{k}": (k + 1) / 210.0 for k in range(20)}
    rows = consume(source_mix(docs.select_columns(["doc_id", "source"]),
                              weights=w))
    dt = time.time() - t0
    print(f"source_mix: {dt:.1f}s  {n_docs/dt:,.0f} docs/s  kept={rows}")

for n_vec in (500_000, 1_000_000):
    vecs = vectors(n_vec).materialize()
    print(f"--- {n_vec} vectors d=64, steal {steal_pct():.2f}% ---")
    t0 = time.time()
    books = pq_train(vecs, m=8, n_codes=32)
    codes = pq_encode(vecs, books).materialize()
    dt = time.time() - t0
    print(f"pq_encode: {dt:.1f}s  {n_vec/dt:,.0f} vec/s")

    qt = pa.concat_tables([ray.get(r) for r in
                           vecs.limit(8).to_arrow_refs()])
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)[:8].astype(np.int64)
    qmat = np.stack([np.asarray(x) for x in qt["embedding"][:8].to_pylist()])
    t0 = time.time()
    res = pq_knn(codes, books, qids, qmat, k=10, rerank_with=vecs)
    dt = time.time() - t0
    print(f"pq_adc+r (8 queries): {dt:.1f}s  "
          f"{n_vec * 8 / dt / 1e6:.1f}M dist/s  rows={len(res)}")
    t0 = time.time()
    res2 = brute_knn(vecs, qids, qmat, k=10)
    dt = time.time() - t0
    inter = 0
    for q in qids:
        inter += len(set(res[res.qid == q].nid)
                     & set(res2[res2.qid == q].nid)) / 10
    print(f"brute (8 queries): {dt:.1f}s  recall_pq_vs_brute={inter/8:.2f}")

ray.shutdown()
