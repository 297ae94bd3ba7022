"""Scale probe: PageRank + connected components on synthetic power-law
graphs (VERDICT r4 #6; results recorded in BASELINE.md round-5 section).
Deterministic generation; fresh 32-CPU Ray session; one config per row of
the BASELINE table, including the zipf-2.5 variant."""
import json
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

from gxdindexer_ray.ops.dedup import connected_components_ds  # noqa: E402
from gxdindexer_ray.ops.graph import pagerank  # noqa: E402


def steal_pct(dt=0.5):
    def snap():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7]
    t0, s0 = snap()
    time.sleep(dt)
    t1, s1 = snap()
    return 100.0 * (s1 - s0) / max(1, (t1 - t0))


CONFIGS = [  # (tag, n_edges, n_nodes, n_buckets, zipf_a)
    ("10M", 10_000_000, 2_000_000, 32, 1.7),
    ("30M", 30_000_000, 5_000_000, 64, 1.7),
    ("30M_zipf2.5", 30_000_000, 5_000_000, 64, 2.5),
]

results = {"steal_pct_start": round(steal_pct(), 2)}
for tag, n_edges, n_nodes, nb, zipf_a in CONFIGS:
    rng = np.random.default_rng(7)
    src = rng.integers(0, n_nodes, n_edges, dtype=np.int64)
    # power-law fan-in: zipf dst ranks -> super-hubs (rank 1 maps to node
    # 0, which receives the zipf head mass — 49% of edges at a=1.7, 75%
    # at a=2.5)
    dst = (rng.zipf(zipf_a, n_edges) - 1).astype(np.int64) % n_nodes
    top = int(np.bincount(dst, minlength=n_nodes).max())
    n_blocks = max(8, n_edges // 1_000_000)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})) \
        .repartition(n_blocks).materialize()

    t0 = time.perf_counter()
    pr = pagerank(ds, iters=10, tol=0.0, n_buckets=nb)
    s = pr.map_batches(
        lambda t: pa.table({"s": [pa.compute.sum(t["rank"]).as_py()],
                            "n": [t.num_rows]}), batch_format="pyarrow"
    ).to_pandas()
    pr_t = time.perf_counter() - t0
    assert abs(s["s"].sum() - 1.0) < 1e-6, s["s"].sum()

    cc_ds = rd.from_arrow(pa.table({"a": pa.array(src), "b": pa.array(dst)})) \
        .repartition(n_blocks).materialize()
    t1 = time.perf_counter()
    cc = connected_components_ds(cc_ds, n_buckets=nb)
    n_lab = cc.map_batches(
        lambda t: pa.table({"n": [t.num_rows]}),
        batch_format="pyarrow").to_pandas()["n"].sum()
    cc_t = time.perf_counter() - t1
    results[tag] = {
        "n_edges": n_edges, "n_nodes": n_nodes, "n_buckets": nb,
        "zipf_a": zipf_a, "max_fan_in": top,
        "pagerank_10it_sec": round(pr_t, 2),
        "pagerank_edges_per_sec_per_iter": int(n_edges * 10 / pr_t),
        "cc_sec": round(cc_t, 2),
        "cc_edges_per_sec": int(n_edges / cc_t),
        "cc_nodes_labeled": int(n_lab),
    }
    print(json.dumps({tag: results[tag]}), flush=True)

results["steal_pct_end"] = round(steal_pct(), 2)
print(json.dumps(results))
ray.shutdown()
