"""Deliberately simple single-process oracle: extract -> tokenize -> index ->
BM25, no Ray. The distributed engine must match it exactly (SURVEY.md §5):
byte-identical text per url, identical (df, cf, postings) per term,
rank-identical top-k docIDs and scores.

Kept primitive on purpose (dicts + lists + scalar loops) so it is obviously
correct and shares no execution machinery with the Ray engine. Only the
frozen *specs* are shared: extract_text, tokenize, doc_id_of, and the BM25
formula (sharing the formula is what makes score identity a meaningful,
testable contract rather than a tolerance check).
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pyarrow.parquet as pq

from ..index.docid import doc_id_of
from ..query.bm25 import idf, tf_factor
from ..text.extract import extract_text
from ..text.tokenize import tokenize


def dedup_tiebreak_hash(text: str) -> bytes:
    """Frozen dedup tie-break hash (dedup-rule v2): blake2b-128 of the
    extracted text. Shared by the oracle and the distributed engine."""
    import hashlib

    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).digest()


class OracleIndex:
    def __init__(self, k1: float = 0.9, b: float = 0.4):
        self.k1 = k1
        self.b = b
        self.docs: dict[int, tuple[str, int]] = {}  # doc_id -> (url, dl)
        self.text_by_url: dict[str, str] = {}
        self.postings: dict[str, dict[int, int]] = {}  # term -> {doc_id: tf}
        self.N = 0
        self.total_dl = 0

    # --- build ---------------------------------------------------------
    @classmethod
    def build_from_pages(cls, pages_dir: str | Path, k1: float = 0.9, b: float = 0.4) -> "OracleIndex":
        rows: list[tuple[str, int, bytes | None]] = []
        import pyarrow as pa

        for f in sorted(Path(pages_dir).glob("*.parquet")):
            t = pq.read_table(f, columns=["url", "warc_ts", "html"])
            ts_us = t["warc_ts"].cast(pa.int64()).to_pylist()
            for url, ts, html in zip(t["url"].to_pylist(), ts_us, t["html"].to_pylist()):
                rows.append((url, ts, html))
        return cls.build_from_rows(rows, k1=k1, b=b)

    @classmethod
    def build_from_rows(cls, rows, k1: float = 0.9, b: float = 0.4) -> "OracleIndex":
        """rows: iterable of (url, warc_ts_us:int, html:bytes|None)."""
        # exact dedup, first-wins: min (warc_ts, blake2b-128(extracted_text))
        # per url — the total order both engines implement (D3, SURVEY.md
        # §2.8; dedup-rule v2). Tie-breaking on a HASH of the post-extraction
        # text (not the text itself) lets the distributed engine shuffle
        # ~50-byte key rows instead of document payloads; for distinct
        # timestamps (the normal case) the rule is plain
        # first-wins-by-warc_ts either way, and the hash keeps the rule a
        # deterministic total order on ties (collisions would need equal
        # blake2b-128, i.e. effectively equal text).
        best: dict[str, tuple[int, bytes, str]] = {}
        for url, ts, html in rows:
            text = extract_text(html)
            key = (ts, dedup_tiebreak_hash(text), text)
            if url not in best or key[:2] < best[url][:2]:
                best[url] = key
        ix = cls(k1=k1, b=b)
        for url, (ts, _h, text) in best.items():
            ix.text_by_url[url] = text
            did = doc_id_of(url)
            toks = tokenize(text)
            dl = len(toks)
            ix.docs[did] = (url, dl)
            ix.N += 1
            ix.total_dl += dl
            for term, tf in Counter(toks).items():
                ix.postings.setdefault(term, {})[did] = tf
        return ix

    # --- derived artifacts ---------------------------------------------
    @property
    def avgdl(self) -> float:
        return self.total_dl / self.N if self.N else 0.0

    def term_stats(self) -> dict[str, tuple[int, int]]:
        """term -> (df, cf)."""
        return {t: (len(p), sum(p.values())) for t, p in self.postings.items()}

    def sorted_postings(self, term: str) -> list[tuple[int, int, int]]:
        """[(doc_id, tf, dl)] ascending by doc_id."""
        p = self.postings.get(term, {})
        return sorted((d, tf, self.docs[d][1]) for d, tf in p.items())

    # --- query ----------------------------------------------------------
    def boolean_topk(self, must: list[str], k: int, must_not: list[str] | None = None):
        """AND over must terms minus must_not, BM25-ranked (scalar sets)."""
        must = sorted({t for m in must for t in tokenize(m)})
        must_not = [t for m in (must_not or []) for t in tokenize(m)]
        if not must:
            return []
        cand: set[int] | None = None
        for t in must:
            docs = set(self.postings.get(t, {}))
            cand = docs if cand is None else (cand & docs)
            if not cand:
                return []
        for t in set(must_not or ()):
            cand -= set(self.postings.get(t, {}))
        ranked = [(d, s) for d, s in self.topk(" ".join(must), self.N) if d in cand]
        return ranked[:k]

    def phrase_topk(self, phrase: str, k: int):
        """Exact adjacent-token phrase over every doc's text, BM25-ranked."""
        toks = tokenize(phrase)
        if not toks:
            return []
        n = len(toks)
        matched = set()
        for did, (url, _) in self.docs.items():
            dtoks = tokenize(self.text_by_url[url])
            for i in range(len(dtoks) - n + 1):
                if dtoks[i:i + n] == toks:
                    matched.add(did)
                    break
        ranked = [(d, s) for d, s in self.topk(" ".join(sorted(set(toks))), self.N) if d in matched]
        return ranked[:k]

    def topk(self, query: str, k: int, boosts: dict[str, float] | None = None) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(self.N, len(plist)) * (boosts.get(t, 1.0) if boosts else 1.0)
            for did, tf in plist.items():
                dl = self.docs[did][1]
                s = w * tf_factor(float(tf), float(dl), self.k1, self.b, self.avgdl)
                scores[did] = scores.get(did, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
