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


def _decoded(rows: list[dict], block_size: int):
    from ..codecs.postings import decode_postings

    out = []
    for r in sorted(rows, key=lambda r: int(r["shard"])):
        pl = r.get("_pl")
        if pl is None:
            pl = decode_postings(r, block_size=block_size)
            r["_pl"] = pl
        out.append(pl)
    return out


class PhraseAndBooleanMixin:
    """Boolean and phrase retrieval over the same segments.

    - boolean: vectorized posting-set algebra (np.intersect1d/setdiff1d on
      docID arrays) -> BM25-score the survivors; ranks/scores match the
      oracle because survivors are scored with the standard scorer.
    - phrase: candidate docs = AND of the phrase terms' postings, then
      exact adjacency verification against the doc-store text (docstore
      files are docID-range clustered, so the candidate reads are pruned
      row-group reads, not scans). This is the verify-on-candidates design:
      no positions in the postings, exact results, cost bounded by the
      rarest term's df."""

    def _score_candidates(self, terms: list[str], cand, k: int) -> list[tuple[int, float]]:
        """Score ONLY the candidate set (searchsorted tf/dl gather) — cost
        no longer proportional to the terms' total postings."""
        from ..query.brute import candidate_topk

        term_rows = self.reader.fetch_terms(terms)
        return candidate_topk(
            term_rows, cand,
            N=self.reader.N, avgdl=self.reader.avgdl, k1=self.reader.k1,
            b=self.reader.b, block_size=self.reader.block_size, k=k,
        )

    def _candidate_docs(self, terms: list[str]) -> "np.ndarray":
        import numpy as np

        if not terms:
            return np.empty(0, dtype=np.uint64)
        term_rows = self.reader.fetch_terms(sorted(set(terms)))
        if len(term_rows) < len(set(terms)):
            return np.empty(0, dtype=np.uint64)  # some term matches nothing
        sets = []
        for t, rows in term_rows.items():
            pls = _decoded(rows, self.reader.block_size)
            sets.append(np.concatenate([pl.doc_ids for pl in pls]))
        sets.sort(key=len)
        cand = sets[0]
        for s in sets[1:]:
            cand = np.intersect1d(cand, s, assume_unique=True)
            if cand.size == 0:
                break
        return cand

    def boolean_topk(self, must: list[str], k: int, must_not: list[str] | None = None,
                     ) -> list[tuple[int, float]]:
        """AND semantics over ``must`` terms minus ``must_not``, BM25-ranked."""
        import numpy as np

        from ..text.tokenize import tokenize

        must = [t for m in must for t in tokenize(m)]
        must_not = [t for m in (must_not or []) for t in tokenize(m)]
        cand = self._candidate_docs(must)
        if cand.size and must_not:
            for t, rows in self.reader.fetch_terms(sorted(set(must_not))).items():
                excl = np.concatenate([pl.doc_ids for pl in _decoded(rows, self.reader.block_size)])
                cand = np.setdiff1d(cand, excl, assume_unique=True)
        if cand.size == 0:
            return []
        return self._score_candidates(sorted(set(must)), cand, k)

    def phrase_topk(self, phrase: str, k: int) -> list[tuple[int, float]]:
        """Exact phrase match (tokens adjacent in spec order), BM25-ranked
        over the phrase's terms. Uses index-resident positions when the
        index was built with ``store_positions``; otherwise verifies
        adjacency against the doc-store text."""
        from ..text.tokenize import tokenize

        toks = tokenize(phrase)
        if not toks:
            return []
        cand = self._candidate_docs(toks)
        if cand.size == 0:
            return []
        term_rows = self.reader.fetch_terms(sorted(set(toks)))
        has_positions = all(
            r.get("pos_payload") is not None for rows in term_rows.values() for r in rows
        )
        if has_positions:
            matched = self._verify_phrase_positional(cand, toks, term_rows)
        else:
            texts = self._texts_for(cand)
            matched = []
            n = len(toks)
            for did in cand.tolist():
                dtoks = tokenize(texts.get(int(did), ""))
                for i in range(len(dtoks) - n + 1):
                    if dtoks[i:i + n] == toks:
                        matched.append(int(did))
                        break
        if not matched:
            return []
        import numpy as np

        return self._score_candidates(sorted(set(toks)), np.asarray(matched, dtype=np.uint64), k)

    def _verify_phrase_positional(self, cand, toks: list[str], term_rows) -> list[int]:
        """Adjacency check straight from the position streams: doc survives
        iff some position p of toks[0] has p+j in positions(toks[j]) for all
        j — no docstore read at all."""
        import numpy as np

        from ..codecs.postings import decode_positions

        # per term: (sorted doc array, offsets, positions) across shards
        per_term: dict[str, list] = {}
        for t, rows in term_rows.items():
            parts = []
            for r, pl in zip(sorted(rows, key=lambda r: int(r["shard"])),
                             _decoded(rows, self.reader.block_size)):
                off, pos = decode_positions(r, pl)
                parts.append((pl.doc_ids, off, pos))
            per_term[t] = parts

        def positions_of(t: str, did: int) -> np.ndarray:
            for doc_ids, off, pos in per_term[t]:
                i = int(np.searchsorted(doc_ids, did))
                if i < doc_ids.size and int(doc_ids[i]) == did:
                    return pos[off[i]:off[i + 1]]
            return np.empty(0, dtype=np.uint64)

        matched = []
        for did in cand.tolist():
            surv = positions_of(toks[0], int(did))
            for j, t in enumerate(toks[1:], 1):
                if surv.size == 0:
                    break
                pj = positions_of(t, int(did))
                surv = surv[np.isin(surv + np.uint64(j), pj)]
            if surv.size:
                matched.append(int(did))
        return matched

    def _texts_for(self, doc_ids) -> dict[int, str]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from ..index.reader import generation_dirs

        root = Path(self.reader.index_dir)
        files = [str(f)
                 for d in [root] + generation_dirs(root)
                 for f in sorted((d / "docs").glob("*.parquet"))]
        ds = pads.dataset(files, format="parquet")
        ids = [int(d) for d in doc_ids]
        tbl = ds.to_table(columns=["doc_id", "text"], filter=pc.field("doc_id").isin(ids))
        return dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))


class SearchEngine(PhraseAndBooleanMixin):
    def __init__(self, index_dir: str | Path, warm_top_terms: int = 64,
                 lexicon: dict | None = None):
        self.reader = IndexReader(index_dir, warm_top_terms=warm_top_terms,
                                  lexicon=lexicon)

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
    """Callable class for map_batches: index opened once per actor; the
    LEXICON arrives prebuilt from the object store (built once on the
    driver, ray.put) instead of each actor re-parsing every segment's
    metadata — the per-actor load was the pool's QPS bound."""

    def __init__(self, index_dir: str, method: str = "auto", lexicon_ref=None):
        import ray

        lexicon = ray.get(lexicon_ref) if lexicon_ref is not None else None
        # no eager warm-up in pool actors: N actors re-reading the hottest
        # row groups concurrently just thrashes shared memory bandwidth
        self.engine = SearchEngine(index_dir, warm_top_terms=0, lexicon=lexicon)
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

    from ..index.reader import build_lexicon

    lexicon_ref = ray.put(build_lexicon(index_dir))  # built once, shared
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    # FIXED pool size: autoscaling ramped actors one-by-one and the whole
    # pass finished before the pool reached size (measured 52-60 qps
    # autoscaled vs 74 qps fixed on the same 1000-query pass). One CPU of
    # headroom stays free for the surrounding operators — a pool equal to
    # the whole cluster deadlocks a small session.
    pool = concurrency or max(1, min(8, ncpu - 1))
    max_actors = pool[1] if isinstance(pool, tuple) else pool
    # a single input block would feed ONE actor no matter the pool size;
    # split so every actor can pull work (queries are tiny rows)
    queries_ds = queries_ds.repartition(max_actors * 4)
    return queries_ds.map_batches(
        _QueryActor,
        fn_constructor_kwargs={"index_dir": str(index_dir), "method": method,
                               "lexicon_ref": lexicon_ref},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pool,
    )
