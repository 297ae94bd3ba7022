"""Scale probe: round-5 curation operators (decontamination, token
chunking, shuffle-shard, tf-idf keywords) on a synthetic zipf-vocabulary
corpus far above fixture scale. Deterministic generation (tokens are a
pure function of doc id); fresh 32-CPU Ray session; results recorded in
BASELINE.md round-5 section."""
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

from gxdindexer_ray.ops.decontam import ngram_contamination  # noqa: E402
from gxdindexer_ray.ops.relational import _splitmix64  # noqa: E402
from gxdindexer_ray.ops.sampling import shuffle_shard  # noqa: E402
from gxdindexer_ray.ops.textops import chunk_tokens, top_tfidf_terms  # noqa: E402

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
    """Deterministic synthetic docs: token t of doc d is
    vocab[splitmix64(d * DOC_TOKENS + t) mod zipf-bucket] — heavy-headed
    (quadratic map onto the vocab) so n-grams genuinely collide across
    docs like web boilerplate does."""
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = (ids[:, None] * DOC_TOKENS
               + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64)  # quadratic -> zipf-ish head
        w = w.reshape(len(ids), DOC_TOKENS)
        # plant boilerplate: every 10th doc opens with one of 32 shared
        # 8-token headers, so bench/candidate 4-gram overlaps are real and
        # the hit path (is_in + re-distinct + counts) runs at scale
        boiler = ids % 10 == 0
        if boiler.any():
            variant = (_splitmix64(ids[boiler].view(np.uint64))
                       % np.uint64(32)).astype(np.int64)
            w[boiler, :8] = (variant[:, None] * 8
                             + np.arange(8)[None, :] + VOCAB)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(row) for row in
                 toks.reshape(len(ids), DOC_TOKENS)]
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts, pa.string())})
    return (rd.range(n_docs, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


def consume(ds):
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
    return n


for n_docs in (200_000, 400_000):
    docs = corpus(n_docs).materialize()
    print(f"--- {n_docs} docs, steal {steal_pct():.2f}% ---")

    def side(bench):
        def f(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 13 == 0) if bench else (ids % 13 != 0)
            return t.filter(pa.array(m))
        return f

    t0 = time.time()
    cand = docs.map_batches(side(False), batch_format="pyarrow")
    bench = docs.map_batches(side(True), batch_format="pyarrow")
    rows = consume(ngram_contamination(cand, bench, n=4, n_buckets=64))
    dt = time.time() - t0
    grams = n_docs * (DOC_TOKENS - 3)
    print(f"decontam: {dt:.1f}s  {n_docs/dt:,.0f} docs/s  "
          f"{grams/dt/1e6:.2f}M grams/s  flagged={rows}")

    t0 = time.time()
    rows = consume(chunk_tokens(docs, size=32, stride=24))
    dt = time.time() - t0
    print(f"chunk:    {dt:.1f}s  {n_docs/dt:,.0f} docs/s  chunks={rows}")

    t0 = time.time()
    rows = consume(shuffle_shard(docs.select_columns(["doc_id"]),
                                 id_col="doc_id", n_shards=64))
    dt = time.time() - t0
    print(f"shuffle:  {dt:.1f}s  {n_docs/dt:,.0f} docs/s")

    t0 = time.time()
    rows = consume(top_tfidf_terms(docs, k=3, n_docs=n_docs))
    dt = time.time() - t0
    print(f"tfidf:    {dt:.1f}s  {n_docs/dt:,.0f} docs/s  rows={rows}")

ray.shutdown()
