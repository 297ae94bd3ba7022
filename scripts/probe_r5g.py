"""Scale probe: round-5 additions q115-q118 above fixture scale (fresh
32-CPU session; recorded in BASELINE.md) — retention cohorts, robust
MAD outliers, co-occurrence, triangle counting.

Deterministic synthetic events/graphs; no external data."""
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

from gxdindexer_ray.ops.graph import triangle_count  # noqa: E402
from gxdindexer_ray.ops.relational import (_splitmix64,  # noqa: E402
                                           key_cooccurrence)
from gxdindexer_ray.ops.sketches import robust_outliers  # noqa: E402
from gxdindexer_ray.ops.windows import retention_cohorts  # noqa: E402


def steal(dt=0.5):
    def snap():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return sum(v), v[7]
    a, b = snap()
    time.sleep(dt)
    c, d = snap()
    return 100.0 * (d - b) / max(1, (c - a))


results = {"steal_pct_start": round(steal(), 2)}

# --- retention cohorts: 30M events / 2M users / 26 weeks -------------------
N_EV, N_USERS, WEEKS = 30_000_000, 2_000_000, 26
ids = rd.range(N_EV).map_batches(lambda b: b, batch_format="pyarrow")


def mk_events(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(i.view(np.uint64))
    user = (h % np.uint64(N_USERS)).astype(np.int64)
    # users join in their (user % WEEKS)-th week and are active in a
    # deterministic subset of later weeks
    week = (user % WEEKS) + ((h >> np.uint64(32)) % np.uint64(WEEKS)).astype(np.int64)
    ts = (np.int64(1_700_000_000_000_000)
          + week * np.int64(7 * 86400) * 1_000_000
          + (h % np.uint64(86_400_000_000)).astype(np.int64))
    return pa.table({"user_id": pa.array(user),
                     "ts": pa.array(ts).cast(pa.timestamp("us"))})


t0 = time.time()
out = retention_cohorts(rd.range(N_EV).map_batches(
    mk_events, batch_format="pyarrow"))
t_ret = time.time() - t0
results["retention_30M_events_2M_users"] = {
    "sec": round(t_ret, 2), "events_per_s": int(N_EV / t_ret),
    "out_rows": len(out)}
print("retention", results["retention_30M_events_2M_users"])

# --- robust outliers: 30M rows / 24 keys -----------------------------------
N_RO, N_KEYS = 30_000_000, 24


def mk_vals(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(i.view(np.uint64))
    key = np.char.add("k", (h % np.uint64(N_KEYS)).astype(np.int64).astype("U3"))
    u = (h >> np.uint64(11)).astype(np.float64) / 2.0 ** 53
    v = np.where(i % 1000 == 0, 1e6 * u, 100.0 * u)  # 0.1% gross outliers
    return pa.table({"event_id": pa.array(i), "event_type": pa.array(key),
                     "value": pa.array(v)})


t0 = time.time()
n_out = robust_outliers(rd.range(N_RO).map_batches(
    mk_vals, batch_format="pyarrow"), "event_type", "value").count()
t_ro = time.time() - t0
results["robust_outliers_30M_rows_24_keys"] = {
    "sec": round(t_ro, 2), "rows_per_s": int(N_RO / t_ro),
    "outliers": int(n_out)}
print("robust_outliers", results["robust_outliers_30M_rows_24_keys"])

# --- co-occurrence: 20M events / 1M users / 200 items ----------------------
N_CO, N_CU, N_ITEMS = 20_000_000, 1_000_000, 200


def mk_baskets(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(i.view(np.uint64))
    user = (h % np.uint64(N_CU)).astype(np.int64)
    item = np.char.add("i", ((h >> np.uint64(24)) % np.uint64(N_ITEMS))
                       .astype(np.int64).astype("U4"))
    return pa.table({"user_id": pa.array(user), "event_type": pa.array(item)})


t0 = time.time()
co = key_cooccurrence(rd.range(N_CO).map_batches(
    mk_baskets, batch_format="pyarrow"), "user_id", "event_type")
t_co = time.time() - t0
results["cooccurrence_20M_events_1M_users_200_items"] = {
    "sec": round(t_co, 2), "events_per_s": int(N_CO / t_co),
    "pairs": len(co), "total_cooc": int(co["n_groups"].sum())}
print("cooccurrence", results["cooccurrence_20M_events_1M_users_200_items"])

# --- triangle count: 10M-edge power-law graph ------------------------------
N_TE, N_TN = 10_000_000, 3_000_000


def mk_edges(batch: pa.Table) -> pa.Table:
    i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = _splitmix64(i.view(np.uint64))
    src = (h % np.uint64(N_TN)).astype(np.int64)
    # zipf-ish dst: quadratic map concentrates mass on low ids (hubs)
    u = ((h >> np.uint64(11)).astype(np.float64) / 2.0 ** 53)
    dst = (u * u * N_TN).astype(np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


t0 = time.time()
tri = triangle_count(rd.range(N_TE).map_batches(
    mk_edges, batch_format="pyarrow"))
t_tri = time.time() - t0
results["triangles_10M_edges_3M_nodes_powerlaw"] = {
    "sec": round(t_tri, 2), "edges_per_s": int(N_TE / t_tri),
    "n_triangles": int(tri["n_triangles"].iloc[0])}
print("triangles", results["triangles_10M_edges_3M_nodes_powerlaw"])

results["steal_pct_end"] = round(steal(), 2)
import json  # noqa: E402

print(json.dumps(results))
ray.shutdown()
