"""CLI entry point — the reference's Main registry + bin/buildIndex surface
(reference Main.java:24-86, bin/buildIndex) re-expressed:

  python -m gxdindexer_ray list                         # named pipelines
  python -m gxdindexer_ray build  --pages D --out D     # flagship index build
  python -m gxdindexer_ray query  --index D --q "..." [--k 10]
  python -m gxdindexer_ray run    --pipeline NAME [NAME...|all] --sf DIR

Owns its Ray session (the driver/tests import the library instead)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gxdindexer_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list named pipelines")

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="top-k BM25 query against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--method", default="auto", choices=["auto", "bmw", "brute"])
    q.add_argument("--phrase", action="store_true", help="exact phrase match instead of ranked OR")
    q.add_argument("--num-cpus", type=int, default=None)

    r = sub.add_parser("run", help="run named pipelines over an sf dir")
    r.add_argument("--pipeline", nargs="+", required=True,
                   help="pipeline names from `list`, or 'all'")
    r.add_argument("--sf", required=True)
    r.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    from .pipelines.queries import CATALOG

    if args.cmd == "list":
        for name in CATALOG:
            print(name)
        print("build_index  (flagship: `build` subcommand)")
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        if args.cmd == "build":
            from .config import DEFAULT_CONFIG
            from .pipelines import build_index

            m = build_index(args.pages, args.out, DEFAULT_CONFIG, resume=not args.no_resume)
            print(json.dumps(m))
            return 0
        if args.cmd == "query":
            from .pipelines import SearchEngine

            eng = SearchEngine(args.index)
            hits = (eng.phrase_topk(args.q, args.k) if args.phrase
                    else eng.topk(args.q, args.k, args.method))
            for rank, (doc, score) in enumerate(hits, 1):
                print(f"{rank}\t{doc}\t{score:.6f}")
            return 0
        if args.cmd == "run":
            names = list(CATALOG) if args.pipeline == ["all"] else args.pipeline
            failed = []
            for name in names:
                if name not in CATALOG:
                    print(f"unknown pipeline: {name}", file=sys.stderr)
                    failed.append(name)
                    continue
                t0 = time.perf_counter()
                try:
                    res = CATALOG[name][0](args.sf)
                    import ray.data as rd

                    n = res.count() if isinstance(res, rd.Dataset) else len(res)
                    print(f"{name}\tok\trows={n}\t{time.perf_counter() - t0:.2f}s")
                except Exception as e:  # mirror per-indexer failure accounting (Main.java:118-129)
                    print(f"{name}\tFAILED\t{type(e).__name__}: {e}", file=sys.stderr)
                    failed.append(name)
            return 1 if failed else 0
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
