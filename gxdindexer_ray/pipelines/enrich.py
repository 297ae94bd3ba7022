"""Reference-parity document enrichment: the GxdResultIndexer doc-build
semantics (SURVEY.md §7.1 step 10) re-expressed as one broadcast-join
``map_batches`` stage over the doc store.

Mirrors, per field:
- broadcast hash-join lookups against side tables loaded once per actor
  (T1-T12; reference GxdResultIndexer.java:91-272, 979-1247);
- multi-valued fields as Arrow list columns with ORDER-PRESERVING,
  duplicate-suppressing accumulation (the dupTracker / addAllFromLookupNoDups
  helpers, reference Indexer.java:375-408 — D2);
- ancestor-closure expansion of the doc's terms (T7/T8; reference
  SharedQueries.java:59-62): each doc's top terms are extended by their
  ancestors, deduped, order preserved;
- synonym attach (T3; reference GxdResultIndexer.java:391-420);
- derived scalar fields: site entity attributes (left-outer semantics:
  null on miss, M9/J3), position-decayed boost ordinals
  (maxBoost / 1.5^idx floored at 1 — M12; reference shr/SolrUtils.java:13-27).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray

ENRICHED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("site", pa.string()),
        pa.field("category", pa.string()),
        pa.field("region", pa.string()),
        pa.field("top_terms", pa.list_(pa.string())),
        pa.field("term_boosts", pa.list_(pa.float64())),
        pa.field("expanded_terms", pa.list_(pa.string())),
        pa.field("synonyms", pa.list_(pa.string())),
        pa.field("labels", pa.list_(pa.string())),
    ]
)

_SITE_RE = re.compile(r"https?://(site\d+)\.")


def nodup_extend(acc: list, seen: set, values) -> None:
    """Order-preserving, duplicate-suppressing accumulate — the reference's
    dupTracker semantics (Indexer.java:375-408)."""
    for v in values:
        if v not in seen:
            seen.add(v)
            acc.append(v)


def position_boost(idx: int, max_boost: float = 100.0) -> float:
    """Position-decayed boost, floor 1 (shr/SolrUtils.java:13-27)."""
    return max(max_boost / (1.5 ** idx), 1.0)


class EnrichDocsStage:
    """Actor-pool map_batches stage: all side maps fetched from the object
    store ONCE per actor in __init__ (the T9 cache-load pattern)."""

    def __init__(self, side_ref, top_k: int = 5):
        side = ray.get(side_ref) if isinstance(side_ref, ray.ObjectRef) else side_ref
        # missing side tables degrade to empty (the reference's
        # degrade-on-failure cache loads, GxdResultIndexer.java:770-798:
        # a failed optional load logs and indexes without that field)
        self.site_attrs: dict[str, tuple[str, str]] = side.get("site_attrs", {})
        self.synonyms: dict[str, list[str]] = side.get("synonyms", {})
        self.ancestors: dict[str, list[str]] = side.get("ancestors", {})
        self.labels: dict[str, list[str]] = side.get("labels", {})
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..text.tokenize import doc_term_counts

        urls = batch["url"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        vocab, doc_idx, codes, tf = doc_term_counts(batch["text"])
        vlist = vocab.to_pylist()
        n = batch.num_rows

        # per-doc top-k terms by (tf desc, term asc) — deterministic
        per_doc: list[list[tuple[int, str]]] = [[] for _ in range(n)]
        for d, c, t in zip(doc_idx, codes, tf):
            per_doc[int(d)].append((-int(t), vlist[int(c)]))

        sites, cats, regs = [], [], []
        top_terms, boosts, expanded, syns, labels = [], [], [], [], []
        for i in range(n):
            m = _SITE_RE.match(urls[i])
            site = m.group(1) if m else None
            attr = self.site_attrs.get(site) if site else None
            sites.append(site)
            cats.append(attr[0] if attr else None)   # left-outer: null on miss (J3/M9)
            regs.append(attr[1] if attr else None)

            top = [t for _, t in sorted(per_doc[i])[: self.top_k]]
            top_terms.append(top)
            boosts.append([position_boost(j) for j in range(len(top))])

            acc: list[str] = []
            seen: set[str] = set()
            nodup_extend(acc, seen, top)
            for t in top:
                nodup_extend(acc, seen, self.ancestors.get(t, ()))
            expanded.append(acc)

            sacc: list[str] = []
            sseen: set[str] = set()
            for t in top:
                nodup_extend(sacc, sseen, self.synonyms.get(t, ()))
            syns.append(sacc)

            lacc: list[str] = []
            lseen: set[str] = set()
            nodup_extend(lacc, lseen, self.labels.get(urls[i], ()))
            labels.append(lacc)

        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "site": pa.array(sites, pa.string()),
                "category": pa.array(cats, pa.string()),
                "region": pa.array(regs, pa.string()),
                "top_terms": pa.array(top_terms, pa.list_(pa.string())),
                "term_boosts": pa.array(boosts, pa.list_(pa.float64())),
                "expanded_terms": pa.array(expanded, pa.list_(pa.string())),
                "synonyms": pa.array(syns, pa.list_(pa.string())),
                "labels": pa.array(labels, pa.list_(pa.string())),
            },
            schema=ENRICHED_SCHEMA,
        )


def build_side_state(vocab: list[str], urls: list[str], seed: int = 42,
                     loaders: dict | None = None) -> dict:
    """Materialize the side tables into broadcast-ready dicts (the driver's
    Phase A, reference GxdResultIndexer.java:764-827).

    Each side table is OPTIONAL: a loader that raises degrades that table
    to empty with a logged error instead of failing the build — the
    reference's per-cache try/catch ('no GO terms will be indexed',
    GxdResultIndexer.java:770-798). ``loaders`` overrides individual
    zero-arg loaders per side key (used by tests / alternate sources)."""
    import logging

    from ..fixtures.sidetables import doc_labels, site_attrs, term_ancestors, term_synonyms

    log = logging.getLogger(__name__)

    def _site():
        sa = site_attrs(seed)
        return {s: (c, r) for s, c, r in zip(
            sa["site"].to_pylist(), sa["category"].to_pylist(), sa["region"].to_pylist())}

    def _pairs(tbl, kcol, vcol):
        out: dict[str, list[str]] = {}
        for k, v in zip(tbl[kcol].to_pylist(), tbl[vcol].to_pylist()):
            out.setdefault(k, []).append(v)
        return out

    default_loaders = {
        "site_attrs": _site,
        "synonyms": lambda: _pairs(term_synonyms(vocab, seed), "term", "synonym"),
        "ancestors": lambda: _pairs(term_ancestors(vocab, seed), "term", "ancestor"),
        "labels": lambda: _pairs(doc_labels(urls, seed), "url", "label"),
    }
    if loaders:
        default_loaders.update(loaders)
    side: dict = {}
    for key, loader in default_loaders.items():
        try:
            side[key] = loader()
        except Exception as exc:  # degrade, never fail the doc build
            log.error("side table %r failed to load (%s); no %s will be "
                      "indexed", key, exc, key)
            side[key] = {}
    return side


def enrich_docs(docs_ds, side: dict, *, concurrency=(1, 8), batch_size: int = 1024):
    """docs (doc_id, url, text) -> enriched docs Dataset."""
    side_ref = ray.put(side)
    return docs_ds.map_batches(
        EnrichDocsStage,
        fn_constructor_kwargs={"side_ref": side_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
