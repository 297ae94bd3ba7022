"""Scale probe: q105 global_rank and q106 interval_overlap_join above
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

from gxdindexer_ray.ops.relational import (_splitmix64,  # noqa: E402
                                           interval_overlap_join)
from gxdindexer_ray.ops.sketches import global_rank  # noqa: E402


def steal(dt=0.5):
    def snap():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(v), v[7]
    a, b = snap()
    time.sleep(dt)
    c, d = snap()
    return 100.0 * (d - b) / max(1, (c - a))


def table(n, heavy_ties):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids.view(np.uint64))
        mod = np.uint64(1000 if heavy_ties else 2 ** 62)
        return pa.table({"doc_id": pa.array(ids),
                         "v": pa.array((h % mod).astype(np.int64))})
    return rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")


def intervals(n, n_keys, width, tag):
    def gen(batch):
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64((ids + tag * 10 ** 9).view(np.uint64))
        s = (np.int64(1_700_000_000_000_000)
             + (h % np.uint64(10 ** 10)).astype(np.int64))
        return pa.table({"k": pa.array(ids % n_keys),
                         "s": pa.array(s),
                         "e": pa.array(s + width),
                         "rid": pa.array(ids)})
    return rd.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")


for n in (2_000_000, 5_000_000):
    for ties, name in ((False, "distinct"), (True, "1k-value ties")):
        ds = table(n, ties).materialize()
        print(f"--- global_rank {n:,} rows ({name}), "
              f"steal {steal():.2f}% ---")
        t0 = time.time()
        out = global_rank(ds, "v", "doc_id")
        mx = out.map_batches(lambda t: pa.table({
            "m": pa.array([int(t["rank"].to_numpy(
                zero_copy_only=False).max())]),
            "s": pa.array([int(t["rank"].to_numpy(
                zero_copy_only=False).sum())])}),
            batch_format="pyarrow").to_pandas()
        dt = time.time() - t0
        ok = (mx["m"].max() == n
              and mx["s"].sum() == n * (n + 1) // 2)
        print(f"global_rank: {dt:.1f}s  {n/dt:,.0f} rows/s  "
              f"rank-sum/max exact: {ok}")

for n in (500_000, 1_000_000):
    L = intervals(n, n_keys=n // 20, width=2_000_000, tag=0).materialize()
    R = intervals(n, n_keys=n // 20, width=2_000_000, tag=1).materialize()
    print(f"--- interval_overlap_join {n:,} x {n:,} "
          f"(20 intervals/key, 2s width), steal {steal():.2f}% ---")
    t0 = time.time()
    j = interval_overlap_join(L, R, left_cols=("s", "e"),
                              right_cols=("s", "e"), key_cols=["k"])
    cnt = sum(b.num_rows for b in j.iter_batches(batch_format="pyarrow"))
    dt = time.time() - t0
    print(f"interval_join: {dt:.1f}s  {2*n/dt:,.0f} intervals/s  "
          f"pairs={cnt:,}")

ray.shutdown()
