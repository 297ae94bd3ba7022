"""Scale probe: round-5 extension pack q109-q113 above fixture scale
(fresh 32-CPU session; recorded in BASELINE.md) — sequence packing,
top-k per key, URL canonicalization, snapshot diff.

Synthetic zipf-token docs reuse the curation-probe recipe: deterministic
token streams, no external data."""
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

from gxdindexer_ray.ops.packing import pack_token_stream  # noqa: E402
from gxdindexer_ray.ops.relational import (_splitmix64,  # noqa: E402
                                           topk_per_key)
from gxdindexer_ray.ops.textops import (canonicalize_urls,  # noqa: E402
                                        snapshot_diff)


def steal(dt=0.5):
    def snap():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(v), v[7]
    a, b = snap()
    time.sleep(dt)
    c, d = snap()
    return 100.0 * (d - b) / max(1, (c - a))


NTOK = 60


def docs(n, tag=0, edit_mod=0):
    """Deterministic zipf-ish 60-token docs (the curation-probe recipe:
    vectorized quadratic map onto the vocab); edit_mod > 0 appends a
    marker token to every edit_mod-th doc (snapshot 'changed' rows)."""
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = ((ids[:, None] * NTOK + np.arange(NTOK)[None, :]).ravel()
               + tag * 10 ** 12)
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * 5000).astype(np.int64)
        toks = np.char.add("w", w.astype("U6")).reshape(len(ids), NTOK)
        texts = np.array([" ".join(row) for row in toks])
        if edit_mod:
            texts = np.where(ids % edit_mod == 0,
                             np.char.add(texts, " edited"), texts)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts.tolist(), pa.string())})
    return rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")


def keyed(n, n_keys):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids.view(np.uint64))
        return pa.table({"id": pa.array(ids),
                         "g": pa.array((h % np.uint64(n_keys))
                                       .astype(np.int64)),
                         "v": pa.array((_splitmix64(h) % np.uint64(10 ** 6))
                                       .astype(np.int64))})
    return rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")


def urls(n):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        A = np.char.add
        u = np.array(["http", "HTTPS", "https"])[ids % 3]
        u = A(u, "://")
        u = A(u, np.where(ids % 2 == 0, "WWW.", ""))
        u = A(u, A(A("Site", (ids % 100000).astype(str)), ".Example.COM"))
        u = A(u, np.array([":443", ":8080", "", "", ""])[ids % 5])
        u = A(u, A("/Dir/", ids.astype(str)))
        u = A(u, np.where(ids % 6 == 0, "?utm_source=feed&ref=1", ""))
        return pa.table({"doc_id": pa.array(ids),
                         "url": pa.array(u.tolist(), pa.string())})
    return rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")


# --- sequence packing ------------------------------------------------------
for n in (500_000, 1_000_000):
    ds = docs(n).materialize()
    ntok_total = None
    print(f"--- pack_token_stream {n:,} docs (~60 tok), "
          f"steal {steal():.2f}% ---")
    t0 = time.time()
    out = pack_token_stream(ds, seq_len=2048, n_ranges=64, n_buckets=64)
    agg = out.map_batches(lambda t: pa.table({
        "s": pa.array([int(t["n_tok"].to_numpy(
            zero_copy_only=False).sum())]),
        "m": pa.array([int(t["seq_id"].to_numpy(
            zero_copy_only=False).max())])}),
        batch_format="pyarrow").to_pandas()
    dt = time.time() - t0
    total = int(agg["s"].sum())
    nseq = int(agg["m"].max()) + 1
    full = total // 2048
    print(f"pack: {dt:.1f}s  {n/dt:,.0f} docs/s  {total/dt:,.0f} tok/s  "
          f"{total:,} tokens -> {nseq:,} seqs (expect {full + 1})  "
          f"exact: {nseq in (full, full + 1)}")

# --- top-k per key ---------------------------------------------------------
for n, nk in ((5_000_000, 1000), (5_000_000, 500_000)):
    ds = keyed(n, nk).materialize()
    print(f"--- topk_per_key {n:,} rows / {nk:,} keys, "
          f"steal {steal():.2f}% ---")
    t0 = time.time()
    out = topk_per_key(ds, ["g"], value_col="v", tiebreak_col="id", k=5)
    cnt = sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow"))
    dt = time.time() - t0
    print(f"topk: {dt:.1f}s  {n/dt:,.0f} rows/s  kept={cnt:,} "
          f"(<= {5 * nk:,}: {cnt <= 5 * nk})")

# --- URL canonicalization --------------------------------------------------
for n in (5_000_000,):
    ds = urls(n).materialize()
    print(f"--- canonicalize_urls {n:,} urls, steal {steal():.2f}% ---")
    t0 = time.time()
    out = canonicalize_urls(ds)
    agg = out.map_batches(lambda t: pa.table({
        "n": pa.array([t.num_rows]),
        "ok": pa.array([t["canon_url"].null_count == 0])}),
        batch_format="pyarrow").to_pandas()
    dt = time.time() - t0
    print(f"canon: {dt:.1f}s  {n/dt:,.0f} urls/s  all-parsed: "
          f"{bool(agg['ok'].all())}")

# --- snapshot diff ---------------------------------------------------------
for n in (1_000_000,):
    old = docs(n).materialize()
    new = docs(int(n * 1.02), edit_mod=50).materialize()  # 2% adds, 2% edits
    print(f"--- snapshot_diff {n:,} vs {int(n*1.02):,} docs, "
          f"steal {steal():.2f}% ---")
    t0 = time.time()
    out = snapshot_diff(old, new)
    counts = out.to_pandas()["status"].value_counts().to_dict()
    dt = time.time() - t0
    print(f"diff: {dt:.1f}s  {2.02*n/dt:,.0f} docs/s  {counts}")

ray.shutdown()
