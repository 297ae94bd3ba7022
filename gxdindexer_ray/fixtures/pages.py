"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1/§3).

Schema (fixed by BASELINE.json input_hint):
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``.

Everything is a pure function of ``(seed, n_rows)`` — no wall clock, no
external data — so goldens are reproducible byte-for-byte. The ``text``
column is defined as ``extract_text(html)`` (spec v1), which makes the
byte-identical-extraction gate hold by construction on every row,
including the edge rows below (FIXTURES.md §3):

- duplicate urls every 997 rows (later warc_ts, different html) — first-wins
  dedup (D3);
- hot term ``zerg`` in ~2/3 of docs — forces the skew/sharding path;
- null html every 499 rows (offset 1); script/style-only html (offset 2);
- entity-encoded non-ASCII content (offset 3); ~512 KB doc every 9973 rows
  (offset 5); empty-text and single-token docs; case/punct stem variants.
"""

from __future__ import annotations

import hashlib
import json
import os
import string
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..text.extract import extract_text, EXTRACT_SPEC_VERSION

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

FIXTURE_VERSION = 2  # bump when generation rules change
VOCAB_SIZE = 5000
_BASE_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_LANGS = ["en"] * 17 + ["de", "fr", "und"]  # by i % 20 buckets (en 85%)
HOT_TERM = "zerg"


def vocabulary(seed: int = 42) -> list[str]:
    """Deterministic vocabulary of lowercase ascii words, zipf-ranked."""
    rng = np.random.default_rng(seed)
    letters = np.array(list(string.ascii_lowercase))
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < VOCAB_SIZE:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=ln))
        if w not in seen and w != HOT_TERM:
            seen.add(w)
            words.append(w)
    return words


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


def _doc_body(i: int, codes: np.ndarray, vocab: list[str]) -> str:
    toks = [vocab[c] for c in codes]
    if i % 3 != 0:
        toks.insert(0, HOT_TERM)  # hot term in ~2/3 of docs
    if i % 101 == 7:
        toks.extend(["Foo", "foo", "foo."])  # case/punct stem variants
    if i % 811 == 11:
        toks = toks[:1]  # single-token doc
    if i % 811 == 12:
        toks = []  # empty-text doc
    return " ".join(toks)


def _make_html(i: int, body: str, rng: np.random.Generator) -> bytes | None:
    if i % 499 == 1:
        return None  # null html
    if i % 499 == 2:  # no extractable text
        return (
            b"<html><head><script>var x = 1 < 2;</script>"
            b"<style>body { color: red }</style></head><body><!-- hidden --></body></html>"
        )
    title = f"page {i}"
    extra = ""
    if i % 499 == 3:
        extra = " café r&#233;sum&#233; &amp; straße"
    if i % 9973 == 5:
        extra = " " + " ".join(f"filler{j % 97}" for j in range(65536))  # ~512 KB doc
    import html as _h

    esc = _h.escape(body)
    doc = (
        f"<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>{title}</title>"
        f"<style>p {{ margin: 0 }}</style><script>console.log(\"skip {i}\");</script></head>"
        f"<body><!-- generated row {i} --><h1>{title}</h1>\n<p>{esc}</p>"
        f"<div><span>{extra}</span></div></body></html>"
    )
    return doc.encode("utf-8")


def _gen_chunk(lo: int, hi: int, seed: int, vocab: list[str], probs: np.ndarray) -> pa.Table:
    rng = np.random.default_rng(seed * 1_000_003 + lo)
    n = hi - lo
    lens = np.clip(rng.lognormal(mean=4.2, sigma=0.6, size=n), 1, 2000).astype(np.int64)
    all_codes = rng.choice(len(vocab), size=int(lens.sum()), p=probs)
    offs = np.concatenate([[0], np.cumsum(lens)])

    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str] = []

    def emit(i: int, ts_us: int, html: bytes | None):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=6).hexdigest()
        urls.append(f"https://site{i % 503}.example/{h}/page{i}")
        ts.append(ts_us)
        htmls.append(html)
        texts.append(None if html is None else extract_text(html))
        langs.append(_LANGS[i % 20])

    for j in range(n):
        i = lo + j
        body = _doc_body(i, all_codes[offs[j]:offs[j + 1]], vocab)
        html = _make_html(i, body, rng)
        emit(i, _BASE_EPOCH_US + i * 1_000_000, html)
        if i % 997 == 0:
            # duplicate url, later warc_ts, different html -> dedup must keep the first
            dup_html = _make_html(i, "duplicate variant " + body[:200], rng)
            urls.append(urls[-1])
            ts.append(_BASE_EPOCH_US + i * 1_000_000 + 500_000_000)
            htmls.append(dup_html)
            texts.append(None if dup_html is None else extract_text(dup_html))
            langs.append(_LANGS[i % 20])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages(
    out_dir: str | os.PathLike,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
) -> Path:
    """Write the pages corpus as a directory of parquet files; idempotent.

    Returns the directory path. A matching manifest short-circuits
    regeneration (the cache key includes the extraction spec version).
    """
    out = Path(out_dir)
    manifest = out / "_fixture_manifest.json"
    key = {
        "version": FIXTURE_VERSION,
        "extract_spec": EXTRACT_SPEC_VERSION,
        "n_rows": n_rows,
        "seed": seed,
        "rows_per_file": rows_per_file,
    }
    if manifest.exists():
        try:
            if json.loads(manifest.read_text()) == key:
                return out
        except (json.JSONDecodeError, OSError):
            pass
    out.mkdir(parents=True, exist_ok=True)
    for f in out.glob("*.parquet"):
        f.unlink()
    vocab = vocabulary(seed)
    probs = _zipf_probs(len(vocab))
    for fi, lo in enumerate(range(0, n_rows, rows_per_file)):
        hi = min(lo + rows_per_file, n_rows)
        tbl = _gen_chunk(lo, hi, seed, vocab, probs)
        tmp = out / f".part-{fi:05d}.parquet.tmp"
        pq.write_table(tbl, tmp, compression="zstd")
        tmp.rename(out / f"part-{fi:05d}.parquet")
    manifest.write_text(json.dumps(key))
    return out


def generate_queries(n_queries: int = 200, seed: int = 42) -> pa.Table:
    """Reference query set (FIXTURES.md §2): 1-4 terms, banded frequencies."""
    vocab = vocabulary(seed)
    rng = np.random.default_rng(seed + 7)
    rows = []
    ks = [1, 10, 100]
    for qid in range(n_queries):
        r = qid % 20
        n_terms = int(rng.integers(1, 5))
        if r < 10:  # 50% common
            terms = [vocab[int(rng.integers(0, 20))] for _ in range(n_terms)]
            if qid % 4 == 0:
                terms[0] = HOT_TERM
        elif r < 16:  # 30% mid
            terms = [vocab[int(rng.integers(100, 1000))] for _ in range(n_terms)]
        elif r < 19:  # 15% rare
            terms = [vocab[int(rng.integers(4000, VOCAB_SIZE))] for _ in range(n_terms)]
        else:  # 5% with an OOV term
            terms = [vocab[int(rng.integers(0, 1000))] for _ in range(max(1, n_terms - 1))]
            terms.append(f"oovxq{qid}")
        rows.append({"query_id": qid, "query": " ".join(terms), "k": ks[qid % 3]})
    return pa.Table.from_pylist(rows)
