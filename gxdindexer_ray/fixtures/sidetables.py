"""Deterministic side-table fixtures for the reference-parity enrichment
pack (FIXTURES.md §5) — the shapes of the reference's broadcast lookup
caches (T2-T12, GxdResultIndexer.java:91-272) keyed to the pages corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_SITES = 503  # matches the pages url generator (site{i % 503})
_CATEGORIES = ["news", "blog", "shop", "docs", "forum"]
_REGIONS = ["na", "eu", "apac"]


def site_attrs(seed: int = 42) -> pa.Table:
    """(site, category, region) — one row per site; the per-chunk entity
    cache analog (T2/J1)."""
    rng = np.random.default_rng(seed + 100)
    sites = [f"site{i}" for i in range(N_SITES)]
    cats = [_CATEGORIES[int(rng.integers(0, len(_CATEGORIES)))] for _ in sites]
    regs = [_REGIONS[i % len(_REGIONS)] for i in range(N_SITES)]
    return pa.table({"site": sites, "category": cats, "region": regs})


def term_synonyms(vocab: list[str], seed: int = 42) -> pa.Table:
    """(term, synonym) 1->N for the first 200 vocab terms — nomenclature
    synonym map analog (T3/T8)."""
    rng = np.random.default_rng(seed + 101)
    terms, syns = [], []
    for t in vocab[:200]:
        for j in range(int(rng.integers(1, 4))):
            terms.append(t)
            syns.append(f"{t}_syn{j}")
    return pa.table({"term": terms, "synonym": syns})


def term_ancestors(vocab: list[str], seed: int = 42) -> pa.Table:
    """(term, ancestor) transitive closure over a small generated DAG:
    terms 0..49 are roots; each term 50..499 gets 1-2 parents among lower
    indices; closure computed exactly (T7/T8 ancestor closure analog)."""
    rng = np.random.default_rng(seed + 102)
    parents: dict[str, set[str]] = {}
    for i, t in enumerate(vocab[:500]):
        if i < 50:
            parents[t] = set()
        else:
            k = int(rng.integers(1, 3))
            parents[t] = {vocab[int(rng.integers(0, i))] for _ in range(k)}
    closure: dict[str, set[str]] = {}

    def anc(t: str) -> set[str]:
        if t not in closure:
            closure[t] = set()
            for p in parents.get(t, ()):  # DAG by construction (parents have lower index)
                closure[t] |= {p} | anc(p)
        return closure[t]

    terms, ancestors = [], []
    for t in vocab[:500]:
        for a in sorted(anc(t)):
            terms.append(t)
            ancestors.append(a)
    return pa.table({"term": terms, "ancestor": ancestors})


def doc_labels(urls: list[str], seed: int = 42) -> pa.Table:
    """(url, label) sparse 1->N with deliberate duplicate labels — the
    result->figure-label map with per-doc dedup (T12/D2)."""
    rng = np.random.default_rng(seed + 103)
    out_u, out_l = [], []
    for u in urls:
        if rng.random() < 0.3:
            n = int(rng.integers(1, 4))
            labels = [f"fig{int(rng.integers(0, 20))}" for _ in range(n)]
            labels.append(labels[0])  # duplicate to exercise dup suppression
            for l in labels:
                out_u.append(u)
                out_l.append(l)
    return pa.table({"url": out_u, "label": out_l})
