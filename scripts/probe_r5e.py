"""Scale probe: the q91/q92 n-gram exchanges, q98 BPE training, q99 DSIR
and q100 session funnels above fixture scale (fresh 32-CPU session;
recorded in BASELINE.md). Synthetic zipf-ish corpus with a planted
8-token boilerplate header on every 11th doc so the n-gram ops have real
duplicated mass to find."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import ray.data as rd  # noqa: E402

from gxdindexer_ray.ops.bpe import bpe_train  # noqa: E402
from gxdindexer_ray.ops.relational import _splitmix64  # noqa: E402
from gxdindexer_ray.ops.textops import (  # noqa: E402
    boilerplate_ngrams, dsir_importance, dup_gram_fraction)
from gxdindexer_ray.ops.windows import session_funnel  # noqa: E402

VOCAB, DOC_TOKENS = 50_000, 60
HEADER = " ".join(f"hdr{i}" for i in range(8))


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
        pos = (ids[:, None] * DOC_TOKENS
               + np.arange(DOC_TOKENS)[None, :]).ravel()
        h = _splitmix64(pos.view(np.uint64)).astype(np.float64) / 2.0 ** 64
        w = (h * h * VOCAB).astype(np.int64).reshape(len(ids), DOC_TOKENS)
        toks = np.char.add("w", w.ravel().astype("U6"))
        texts = [" ".join(r) for r in toks.reshape(len(ids), DOC_TOKENS)]
        texts = [HEADER + " " + t if i % 11 == 0 else t
                 for i, t in zip(ids, texts)]
        langs = np.where(ids % 3 == 0, "en", "de")
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(texts, pa.string()),
                         "lang": pa.array(langs.tolist(), pa.string())})
    return (rd.range(n_docs, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


def events(n_users, per_user=20):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = np.repeat(ids, per_user)
        k = np.tile(np.arange(per_user, dtype=np.int64), len(ids))
        eid = uid * per_user + k
        # deterministic per-event minute offsets 1-40 -> multiple
        # sessions per user (gaps over the 30-min rule appear regularly)
        gap_min = (_splitmix64(eid.view(np.uint64)) % np.uint64(60)) \
            .astype(np.int64)
        ts = (np.int64(1_700_000_000_000_000)
              + k * np.int64(60_000_000) * (1 + gap_min % 40))
        ty = np.where(_splitmix64((eid + 7).view(np.uint64))
                      % np.uint64(4) == 0, "purchase",
                      np.where(k % 2 == 0, "view", "click"))
        return pa.table({
            "user_id": pa.array(uid),
            "event_id": pa.array(eid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "event_type": pa.array(ty.tolist(), pa.string())})
    return (rd.range(n_users, override_num_blocks=64)
            .map_batches(gen, batch_format="pyarrow"))


for n_docs in (200_000, 400_000):
    docs = corpus(n_docs).materialize()
    n_grams = n_docs * (DOC_TOKENS - 7)
    print(f"--- {n_docs} docs, steal {steal_pct():.2f}% ---")

    t0 = time.time()
    out = boilerplate_ngrams(docs, n=5, min_docs=50, k=20)
    dt = time.time() - t0
    hdr_hits = sum(out["gram"].str.startswith("hdr"))
    print(f"boilerplate_ngrams(5): {dt:.1f}s  {n_docs/dt:,.0f} docs/s  "
          f"top-df={out['df'].iloc[0]:,} header-grams-in-top20={hdr_hits}")

    t0 = time.time()
    frac = dup_gram_fraction(docs, n=8)
    planted = frac.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int((t["dup_frac"].to_numpy(zero_copy_only=False) > 0).sum())]),
        }), batch_format="pyarrow").to_pandas()["n"].sum()
    dt = time.time() - t0
    print(f"dup_gram_fraction(8): {dt:.1f}s  {n_docs/dt:,.0f} docs/s  "
          f"{n_grams/dt:,.0f} grams/s  docs-with-dup-mass={planted:,} "
          f"(planted {(n_docs + 10) // 11:,} headered)")

    t0 = time.time()
    w = dsir_importance(docs, domain_col="lang", target_value="en")
    n = sum(b.num_rows for b in w.iter_batches(batch_format="pyarrow"))
    dt = time.time() - t0
    print(f"dsir_importance: {dt:.1f}s  {n_docs/dt:,.0f} docs/s  rows={n:,}")

    t0 = time.time()
    merges = bpe_train(docs, n_merges=6)
    dt = time.time() - t0
    print(f"bpe_train(6 merges): {dt:.1f}s  {n_docs/dt:,.0f} docs/s  "
          f"top-merge={merges['left'].iloc[0]}+{merges['right'].iloc[0]}"
          f":{merges['count'].iloc[0]:,}")

for n_users in (100_000, 200_000):
    ev = events(n_users).materialize()
    n_ev = n_users * 20
    print(f"--- {n_ev:,} events / {n_users:,} users, "
          f"steal {steal_pct():.2f}% ---")
    t0 = time.time()
    out = session_funnel(ev)
    tot = out.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(t["n_sessions"].to_numpy(zero_copy_only=False).sum())]),
            "c": pa.array(
            [int(t["n_converted"].to_numpy(zero_copy_only=False).sum())])}),
        batch_format="pyarrow").to_pandas()
    dt = time.time() - t0
    print(f"session_funnel: {dt:.1f}s  {n_ev/dt:,.0f} events/s  "
          f"sessions={tot['s'].sum():,} converted={tot['c'].sum():,}")

ray.shutdown()
