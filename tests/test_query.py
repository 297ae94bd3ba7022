"""WAND and brute scorers vs the oracle: rank-identical docIDs and
bit-identical scores, including the sharded hot-term path."""

import numpy as np
import pytest

from gxdindexer_ray.codecs.postings import PostingList, encode_postings
from gxdindexer_ray.config import IndexConfig
from gxdindexer_ray.fixtures import generate_queries
from gxdindexer_ray.fixtures.pages import HOT_TERM
from gxdindexer_ray.query.brute import brute_force_topk
from gxdindexer_ray.query.wand import block_max_wand_topk

CFG = IndexConfig()


def _encode_term_rows(ix, term, shard_terms):
    """Encode a term's oracle postings as segment rows (sharded if hot)."""
    plist = ix.sorted_postings(term)
    docs = np.array([d for d, _, _ in plist], dtype=np.uint64)
    tfs = np.array([t for _, t, _ in plist], dtype=np.uint64)
    dls = np.array([l for _, _, l in plist], dtype=np.uint64)
    rows = []
    if term in shard_terms:
        shards = docs >> np.uint64(63 - CFG.shard_bits)
        for s in np.unique(shards):
            m = shards == s
            row = encode_postings(
                PostingList(docs[m], tfs[m], dls[m]),
                block_size=CFG.block_size, avgdl=ix.avgdl, k1=CFG.k1, b=CFG.b,
            )
            row["term"] = term
            row["shard"] = int(s)
            rows.append(row)
    else:
        row = encode_postings(
            PostingList(docs, tfs, dls),
            block_size=CFG.block_size, avgdl=ix.avgdl, k1=CFG.k1, b=CFG.b,
        )
        row["term"] = term
        row["shard"] = 0
        rows.append(row)
    return rows


@pytest.fixture(scope="module")
def encoded(oracle_1k):
    ix = oracle_1k
    shard_terms = {t for t, (df, _) in ix.term_stats().items() if df > ix.N * CFG.hot_df_ratio}
    assert HOT_TERM in shard_terms
    store = {t: _encode_term_rows(ix, t, shard_terms) for t in ix.postings}
    return ix, store


def _rows_for(store, query_terms):
    return {t: store[t] for t in query_terms if t in store}


def test_scorers_match_oracle_on_query_set(encoded):
    from gxdindexer_ray.text.tokenize import tokenize

    ix, store = encoded
    queries = generate_queries(60, seed=42).to_pylist()
    checked = 0
    for q in queries:
        terms = sorted(set(tokenize(q["query"])))
        tr = _rows_for(store, terms)
        expected = ix.topk(q["query"], q["k"])
        kw = dict(N=ix.N, avgdl=ix.avgdl, k1=CFG.k1, b=CFG.b,
                  block_size=CFG.block_size, k=q["k"])
        got_brute = brute_force_topk(tr, **kw)
        got_wand = block_max_wand_topk(tr, **kw)
        assert got_brute == expected, f"brute mismatch q={q}"
        assert got_wand == expected, f"wand mismatch q={q}"
        if expected:
            checked += 1
    assert checked > 40  # most queries hit something


def test_wand_equals_brute_random_corpora():
    """Property-style: random small corpora, all scorer paths agree."""
    from gxdindexer_ray.oracle import OracleIndex

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(30)]
    for trial in range(5):
        rows = []
        for i in range(200):
            n = int(rng.integers(0, 40))
            body = " ".join(rng.choice(vocab, size=n)) if n else ""
            html = f"<p>{body}</p>".encode()
            rows.append((f"http://x/{trial}/{i}", i, html))
        ix = OracleIndex.build_from_rows(rows)
        shard_terms = {t for t, (df, _) in ix.term_stats().items() if df > ix.N * 0.3}
        store = {t: _encode_term_rows(ix, t, shard_terms) for t in ix.postings}
        for qterms in (["t0"], ["t1", "t2"], ["t3", "t4", "t5", "t29"], ["missing"]):
            for k in (1, 7, 1000):
                expected = ix.topk(" ".join(qterms), k)
                tr = _rows_for(store, sorted(set(qterms)))
                kw = dict(N=ix.N, avgdl=ix.avgdl, k1=0.9, b=0.4, block_size=128, k=k)
                assert brute_force_topk(tr, **kw) == expected
                assert block_max_wand_topk(tr, **kw) == expected


def test_boosted_scoring_matches_oracle(encoded):
    """M12 per-term boost (position-decayed field boost analog,
    shr/SolrUtils.java:13-27): boosted weights flow through brute, WAND and
    the oracle identically, including upper bounds in WAND's skipping."""
    ix, store = encoded
    terms = sorted(ix.postings)[:40:10] + [HOT_TERM]
    query = " ".join(terms)
    boosts = {t: 1.0 + i * 0.75 for i, t in enumerate(sorted(set(terms)))}
    expected = ix.topk(query, 25, boosts=boosts)
    tr = _rows_for(store, sorted(set(terms)))
    kw = dict(N=ix.N, avgdl=ix.avgdl, k1=CFG.k1, b=CFG.b,
              block_size=CFG.block_size, k=25, boosts=boosts)
    assert brute_force_topk(tr, **kw) == expected
    assert block_max_wand_topk(tr, **kw) == expected
    # boost actually changes the ranking vs unboosted
    unboosted = ix.topk(query, 25)
    assert unboosted != expected


def test_spellcheck_vectorized_dp_matches_reference():
    """The candidate-vectorized Levenshtein DP equals a scalar reference on
    random strings (plain Levenshtein, no transposition — DuckDB parity)."""
    import random

    import numpy as np

    def ref_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    class FakeReader:
        def __init__(self, terms):
            self._terms = sorted(terms)
            self.N = 10

        def terms_with_prefix(self, prefix):
            return [t for t in self._terms if t.startswith(prefix)]

        def term_stats(self, terms):
            return {t: (1, len(t)) for t in terms}

    from gxdindexer_ray.pipelines.search import SearchEngine

    rng = random.Random(7)
    alphabet = "abcde"
    terms = sorted({"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
                    for _ in range(300)})
    eng = SearchEngine.__new__(SearchEngine)
    eng.reader = FakeReader(terms)
    for q in ("abc", "e", "ddddd", "cabba", "zzz"):
        got = {(t, d) for t, d, _df, _cf in eng.spellcheck(q, k=10**9, max_dist=2)}
        want = {(t, ref_lev(q, t)) for t in terms
                if abs(len(t) - len(q)) <= 2 and ref_lev(q, t) <= 2}
        assert got == want, q
        # SymSpell (default) and length-window scan agree exactly — the
        # deletion-neighborhood probe is exhaustive for lev <= max_dist
        assert eng.spellcheck(q, k=10**9, max_dist=2, method="scan") \
            == eng.spellcheck(q, k=10**9, max_dist=2)


def test_symspell_prunes_candidates():
    """The deletion-neighborhood index probes FAR fewer candidates than the
    length-window scan (the serving-latency mechanism), while returning
    identical suggestions; index build happens once and is cached."""
    import random

    class FakeReader:
        def __init__(self, terms):
            self._terms = sorted(terms)

        def terms_with_prefix(self, prefix):
            return [t for t in self._terms if t.startswith(prefix)]

        def term_stats(self, terms):
            return {t: (1, len(t)) for t in terms}

    from gxdindexer_ray.pipelines.search import SearchEngine, _deletes

    rng = random.Random(11)
    alphabet = "abcdefghijklmnop"
    terms = sorted({"".join(rng.choice(alphabet) for _ in range(6))
                    for _ in range(5000)})
    eng = SearchEngine.__new__(SearchEngine)
    eng.reader = FakeReader(terms)
    q = terms[100][:5] + "q"
    assert eng.spellcheck(q, k=10, max_dist=1) \
        == eng.spellcheck(q, k=10, max_dist=1, method="scan")
    import numpy as np

    variants, tis = eng._symspell_index(1)
    probed = set()
    for v in _deletes(q, 1):
        lo = np.searchsorted(variants, v, side="left")
        hi = np.searchsorted(variants, v, side="right")
        probed.update(tis[lo:hi].tolist())
    arr, lens = eng._spell_lexicon()
    window = ((lens >= len(q) - 1) & (lens <= len(q) + 1)).sum()
    assert len(probed) * 20 < int(window), (len(probed), int(window))
    assert 1 in eng._symspell_cache  # cached, not rebuilt per call
    # mixed distances coexist (dict keyed by max_dist, no eviction)
    eng.spellcheck(q, k=10, max_dist=2)
    assert set(eng._symspell_cache) == {1, 2}
