"""CLI entry point — the reference's Main registry + bin/buildIndex surface
(reference Main.java:24-86, bin/buildIndex) re-expressed:

  python -m gxdindexer_ray list                         # named pipelines
  python -m gxdindexer_ray build  --pages D --out D     # flagship index build
  python -m gxdindexer_ray append --pages D --index D   # delta generation
  python -m gxdindexer_ray compact --index D            # fold generations
  python -m gxdindexer_ray delete --index D --urls U[,U]  # tombstone docs
  python -m gxdindexer_ray query  --index D --q "..." [--k 10] [--fq "dl>=50"]
                                  [--facet COL | --collapse COL] [--snippets]
  python -m gxdindexer_ray suggest --index D --prefix P [--k 10]
  python -m gxdindexer_ray mlt    --index D (--url U | --id N) [--k 10]
  python -m gxdindexer_ray run    --pipeline NAME [NAME...|all] --sf DIR

Owns its Ray session (the driver/tests import the library instead)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gxdindexer_ray")
    p.add_argument("--address", default="local",
                   help="Ray address: 'local' starts an in-process cluster "
                        "(default); 'auto' joins a running cluster — the "
                        "`ray job submit -- python -m gxdindexer_ray ... "
                        "--address auto` path on a real multi-node cluster")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list named pipelines")

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)

    a = sub.add_parser("append", help="append new pages as a delta generation")
    a.add_argument("--pages", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--no-resume", action="store_true")
    a.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("compact", help="fold delta generations into the base index")
    c.add_argument("--index", required=True)
    c.add_argument("--num-cpus", type=int, default=None)

    d = sub.add_parser("delete", help="tombstone docs by id or url (takedowns)")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", default=None, help="comma-separated doc_ids")
    d.add_argument("--urls", default=None, help="comma-separated urls (hashed to doc_ids)")
    d.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="top-k BM25 query against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--method", default="auto", choices=["auto", "bmw", "brute"])
    q.add_argument("--phrase", action="store_true", help="exact phrase match instead of ranked OR")
    q.add_argument("--fq", default=None, metavar="COL OP VAL",
                   help="filter query (Solr fq): restrict results by a "
                        "docstore column, e.g. 'dl>=50' or 'lang==en'; "
                        "scores stay global")
    q.add_argument("--facet", default=None, metavar="COL",
                   help="print (value, n_docs) facet counts of a docstore "
                        "column over the query's OR match set instead of hits")
    q.add_argument("--collapse", default=None, metavar="COL",
                   help="field collapsing: print the best hit per value of "
                        "a docstore column, top-k groups")
    q.add_argument("--snippets", action="store_true",
                   help="append a best-window highlight snippet to each hit")
    q.add_argument("--num-cpus", type=int, default=None)

    ml = sub.add_parser("mlt", help="MoreLikeThis: docs similar to a source doc")
    ml.add_argument("--index", required=True)
    ml.add_argument("--url", default=None, help="source doc url (hashed to its doc id)")
    ml.add_argument("--id", type=int, default=None, help="source doc id")
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=3)
    ml.add_argument("--num-cpus", type=int, default=None)

    sg = sub.add_parser("suggest", help="term completion: top-k indexed terms with a prefix")
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", required=True)
    sg.add_argument("--k", type=int, default=10)
    sg.add_argument("--num-cpus", type=int, default=None)

    sp = sub.add_parser("spellcheck", help="indexed terms within edit distance of a term")
    sp.add_argument("--index", required=True)
    sp.add_argument("--term", required=True)
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--max-dist", type=int, default=1)
    sp.add_argument("--num-cpus", type=int, default=None)

    si = sub.add_parser("spell-index", help="build + seal the persisted "
                        "SymSpell deletion-neighborhood index next to the "
                        "segments (serving processes then load it instead "
                        "of rebuilding per process)")
    si.add_argument("--index", required=True)
    si.add_argument("--max-dist", type=int, default=1)
    si.add_argument("--num-cpus", type=int, default=None)

    r = sub.add_parser("run", help="run named pipelines over an sf dir")
    r.add_argument("--pipeline", nargs="+", required=True,
                   help="pipeline names from `list`, a group alias "
                        "(relational/windows/text/dedup/similarity/serving), "
                        "or 'all'")
    r.add_argument("--sf", required=True)
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--concurrent", type=int, default=1,
                   help="run up to N pipelines concurrently, scheduled "
                        "longest-first from prior-run timings (the "
                        "reference's bin/buildIndexes:36,175-207 strategy)")

    args = p.parse_args(argv)

    from .pipelines.queries import CATALOG

    if args.cmd == "list":
        from .pipelines.queries import GROUPS

        for name in CATALOG:
            print(name)
        for g, members in GROUPS.items():
            print(f"{g}\t(group: {len(members)} pipelines)")
        print("build_index  (flagship: `build` subcommand)")
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kw = dict(include_dashboard=False, logging_level="ERROR")
        if args.address == "local":
            kw["num_cpus"] = args.num_cpus  # only a local cluster takes sizing
        ray.init(address=args.address, **kw)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        if args.cmd == "build":
            from .config import DEFAULT_CONFIG
            from .pipelines import build_index

            m = build_index(args.pages, args.out, DEFAULT_CONFIG, resume=not args.no_resume)
            print(json.dumps(m))
            return 0
        if args.cmd == "append":
            from .config import DEFAULT_CONFIG
            from .pipelines import append_index

            m = append_index(args.pages, args.index, DEFAULT_CONFIG,
                             resume=not args.no_resume)
            print(json.dumps(m))
            return 0
        if args.cmd == "compact":
            from .config import DEFAULT_CONFIG
            from .pipelines import compact_index

            m = compact_index(args.index, DEFAULT_CONFIG)
            print(json.dumps(m))
            return 0
        if args.cmd == "delete":
            from .index.docid import doc_id_of
            from .pipelines import delete_docs

            ids = [int(x) for x in args.ids.split(",")] if args.ids else []
            ids += [doc_id_of(u) for u in args.urls.split(",")] if args.urls else []
            if not ids:
                print("delete: need --ids and/or --urls", file=sys.stderr)
                return 2
            m = delete_docs(args.index, ids)
            print(json.dumps(m))
            return 0
        if args.cmd == "query":
            from .pipelines import SearchEngine

            eng = SearchEngine(args.index)
            if args.facet:
                ft = eng.facet_counts(args.q, args.facet, top=args.k)
                for v, n in zip(ft["value"].to_pylist(), ft["n_docs"].to_pylist()):
                    print(f"{v}\t{n}")
                return 0
            if args.collapse:
                for v, doc, _tie, score in eng.collapse_topk(args.q, args.k, args.collapse):
                    print(f"{v}\t{doc}\t{score:.6f}")
                return 0
            if args.fq:
                from .pipelines.search import parse_doc_filter

                hits = eng.filtered_topk(args.q, args.k,
                                         doc_filter=parse_doc_filter(args.fq))
            elif args.phrase:
                hits = eng.phrase_topk(args.q, args.k)
            else:
                hits = eng.topk(args.q, args.k, args.method)
            snips = {}
            if args.snippets and hits:
                from .text.tokenize import tokenize

                snips = eng.snippets_for([d for d, _ in hits], tokenize(args.q))
            for rank, (doc, score) in enumerate(hits, 1):
                tail = f"\t{snips[doc]}" if args.snippets else ""
                print(f"{rank}\t{doc}\t{score:.6f}{tail}")
            return 0
        if args.cmd == "mlt":
            from .index.docid import doc_id_of
            from .pipelines import SearchEngine

            if (args.url is None) == (args.id is None):
                print("mlt: need exactly one of --url / --id", file=sys.stderr)
                return 2
            src = args.id if args.id is not None else doc_id_of(args.url)
            eng = SearchEngine(args.index, warm_top_terms=0)
            for rank, (doc, score) in enumerate(
                    eng.more_like_this(src, args.k, args.max_terms), 1):
                print(f"{rank}\t{doc}\t{score:.6f}")
            return 0
        if args.cmd == "suggest":
            from .pipelines import SearchEngine

            for term, df, cf in SearchEngine(args.index, warm_top_terms=0) \
                    .suggest(args.prefix, args.k):
                print(f"{term}\t{df}\t{cf}")
            return 0
        if args.cmd == "spellcheck":
            from .pipelines import SearchEngine
            from .pipelines.search import _symspell_paths
            from .state.manifest import read_json

            # one-shot lookup: use the persisted SymSpell artifact when one
            # is sealed next to the segments AND matches the current
            # lexicon; otherwise the length-window scan beats paying an
            # in-process index build for one query (a stale manifest must
            # not bait the engine into the full rebuild)
            eng = SearchEngine(args.index, warm_top_terms=0)
            sdir, man_path = _symspell_paths(args.index, args.max_dist)
            man = read_json(man_path)
            fresh = (man and sdir.is_dir()
                     and man.get("n_terms") == len(eng._spell_lexicon()[0]))
            method = "symspell" if fresh else "scan"
            for term, dist, df, cf in eng.spellcheck(
                    args.term, args.k, args.max_dist, method=method):
                print(f"{term}\t{dist}\t{df}\t{cf}")
            return 0
        if args.cmd == "spell-index":
            from .pipelines.search import build_symspell_index

            n = build_symspell_index(args.index, args.max_dist)
            print(json.dumps({"max_dist": args.max_dist, "n_variants": n}))
            return 0
        if args.cmd == "run":
            from .pipelines.queries import expand_pipeline_names

            names = expand_pipeline_names(args.pipeline)
            failed = []
            unknown = [n for n in names if n not in CATALOG]
            for name in unknown:
                print(f"unknown pipeline: {name}", file=sys.stderr)
                failed.append(name)
            names = [n for n in names if n in CATALOG]

            # prior-run timings drive longest-first scheduling (the
            # reference persists per-indexer times and starts the longest
            # first so the tail isn't a late-started big job —
            # bin/buildIndexes:175-207, timing files :262); unknown
            # pipelines are treated as longest so they get measured early
            import json as _json
            from pathlib import Path as _P

            timings_path = _P("/tmp/gxdray") / "pipeline_timings.json"
            try:
                prior = _json.loads(timings_path.read_text())
            except Exception:
                prior = {}
            names.sort(key=lambda n: -prior.get(n, float("inf")))

            def run_one(name: str):
                t0 = time.perf_counter()
                res = CATALOG[name][0](args.sf)
                import ray.data as rd

                n = res.count() if isinstance(res, rd.Dataset) else len(res)
                return n, time.perf_counter() - t0

            if args.concurrent <= 1:
                results = {}
                for name in names:
                    try:
                        results[name] = run_one(name)
                    except Exception as e:  # per-indexer failure accounting (Main.java:118-129)
                        results[name] = e
            else:
                # pipelines are driver-side orchestration around Ray work,
                # so threads suffice: the Ray scheduler interleaves their
                # tasks (the reference used 3 subprocesses; same effect).
                # Warm Ray's path/filesystem resolution ONCE in this thread
                # first: its lazy imports (fsspec http, pyarrow.fs) race
                # when two threads first-touch them (observed: ImportError
                # on a half-initialized fsspec.implementations.http)
                import glob as _glob

                warm = sorted(_glob.glob(str(_P(args.sf) / "*.parquet")))
                if warm:
                    import ray.data as rd

                    rd.read_parquet(warm[0]).schema()
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=args.concurrent) as ex:
                    futs = {name: ex.submit(run_one, name) for name in names}
                results = {}
                for name, f in futs.items():
                    try:
                        results[name] = f.result()
                    except Exception as e:
                        results[name] = e

            for name in names:
                r = results[name]
                if isinstance(r, Exception):
                    print(f"{name}\tFAILED\t{type(r).__name__}: {r}", file=sys.stderr)
                    failed.append(name)
                else:
                    n, dt = r
                    prior[name] = round(dt, 3)
                    print(f"{name}\tok\trows={n}\t{dt:.2f}s")
            try:
                timings_path.parent.mkdir(parents=True, exist_ok=True)
                timings_path.write_text(_json.dumps(prior, indent=1, sort_keys=True))
            except OSError:
                pass
            return 1 if failed else 0
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
