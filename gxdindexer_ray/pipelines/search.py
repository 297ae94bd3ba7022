"""Query-time top-k BM25 over a built index.

``SearchEngine`` is driver-side (one reader, for tests/CLI);
``batch_search`` runs a query *dataset* through an actor pool where each
actor opens the index once (``__init__``) and serves many query batches —
the index-loaded-once-per-worker case of SURVEY.md §7.2.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

from ..index.reader import IndexReader
from ..query.brute import brute_force_topk
from ..query.wand import block_max_wand_topk
from ..text.tokenize import tokenize


class SearchEngine:
    def __init__(self, index_dir: str | Path, warm_top_terms: int = 64):
        self.reader = IndexReader(index_dir, warm_top_terms=warm_top_terms)

    # below this many candidate postings, vectorized exhaustive scoring beats
    # the per-posting Python cost of WAND; above it, WAND's skipping (which
    # avoids even decoding most blocks) wins. Measured crossover is in the
    # millions on this hardware — numpy scoring is ~50M postings/s while a
    # WAND pivot step costs ~5-10us.
    AUTO_BRUTE_MAX_POSTINGS = 5_000_000

    def topk(self, query: str, k: int, method: str = "auto",
             boosts: dict[str, float] | None = None) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query)))
        term_rows = self.reader.fetch_terms(terms)
        kw = dict(
            N=self.reader.N,
            avgdl=self.reader.avgdl,
            k1=self.reader.k1,
            b=self.reader.b,
            block_size=self.reader.block_size,
            k=k,
            boosts=boosts,
        )
        if method == "auto":
            total = sum(int(r["n_postings"]) for rows in term_rows.values() for r in rows)
            method = "brute" if total <= self.AUTO_BRUTE_MAX_POSTINGS else "bmw"
        if method == "bmw":
            return block_max_wand_topk(term_rows, **kw)
        if method == "brute":
            return brute_force_topk(term_rows, **kw)
        raise ValueError(f"unknown method {method!r}")


class _QueryActor:
    """Callable class for map_batches: index opened once per actor."""

    def __init__(self, index_dir: str, method: str = "auto"):
        # no eager warm-up in pool actors: N actors re-reading the hottest
        # row groups concurrently just thrashes shared memory bandwidth
        self.engine = SearchEngine(index_dir, warm_top_terms=0)
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, q, k in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), batch["k"].to_pylist()
        ):
            for rank, (doc_id, score) in enumerate(self.engine.topk(q, int(k), self.method), 1):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def batch_search(queries_ds, index_dir: str | Path, *, method: str = "auto", concurrency=None):
    """Run a Dataset of (query_id, query, k) through the index actor pool.

    Pool is deliberately modest (each actor amortizes one lexicon load over
    many query batches; query serving is read+decode bound, so a few actors
    saturate a node's memory bandwidth — scale QUERY throughput by adding
    nodes, each with its own reader pool)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    pool = concurrency or (1, max(2, min(8, ncpu)))
    return queries_ds.map_batches(
        _QueryActor,
        fn_constructor_kwargs={"index_dir": str(index_dir), "method": method},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool,
    )
