"""Frozen tokenizer spec (version 1) — scalar oracle path + Arrow-vectorized path.

Spec: lowercase the text, then tokens are maximal runs of ``[a-z0-9]``.
This keeps three implementations provably equivalent:

- scalar (oracle):   ``re.findall("[a-z0-9]+", text.lower())``
- Arrow (hot path):  ``pc.utf8_lower`` -> ``pc.split_pattern_regex`` on
  ``[^a-z0-9]+`` -> flatten, drop empties — all C kernels, no Python loop.
- SQL (DuckDB correctness oracle):
  ``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))`` filtered on ''.

The per-doc term-frequency count (``doc_term_counts``) is vectorized via
dictionary-encode + composite-key bincount instead of a per-doc Counter —
the reference's per-row loop (GxdResultIndexer.java:979-1253) re-expressed
columnar.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
_SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize(text: str) -> list[str]:
    """Scalar tokenizer (oracle path)."""
    return _TOKEN_RE.findall(text.lower())


def tokenize_column(text_col: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a string column with Arrow C kernels.

    Returns ``(tokens, doc_idx)``: a flat string array of all tokens and the
    int64 row index each token came from. Null text rows produce no tokens.
    """
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    lowered = pc.utf8_lower(text_col)
    token_lists = pc.split_pattern_regex(lowered, pattern=_SPLIT_PATTERN)
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists)
    keep = pc.not_equal(flat, "")
    flat = pc.filter(flat, keep)
    parents = pc.filter(parents, keep)
    return flat, parents.to_numpy(zero_copy_only=False).astype(np.int64)


def doc_term_positions(
    text_col: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Token positions grouped per (term, doc), fully vectorized.

    Returns ``(vocab, pair_doc_idx, pair_code, pair_tf, pos_sorted,
    pair_starts)``: the distinct (doc, term) pairs sorted by (code,
    doc_idx), their term frequencies, and the flat token-position stream
    ``pos_sorted`` ordered by (code, doc_idx, position) with
    ``pair_starts`` marking each pair's first position. Positions are
    0-based token offsets within the document."""
    flat, doc_idx = tokenize_column(text_col)
    n = doc_idx.size
    empty = (pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if n == 0:
        return empty
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dic.dictionary
    # token position within its doc: doc_idx is non-decreasing in token order
    pos = np.arange(n, dtype=np.int64) - np.searchsorted(doc_idx, doc_idx, side="left")
    order = np.lexsort((pos, doc_idx, codes))
    s_codes = codes[order]
    s_docs = doc_idx[order]
    s_pos = pos[order]
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (np.diff(s_codes) != 0) | (np.diff(s_docs) != 0)
    pair_starts = np.flatnonzero(change)
    pair_ends = np.append(pair_starts[1:], n)
    pair_tf = pair_ends - pair_starts
    return vocab, s_docs[pair_starts], s_codes[pair_starts], pair_tf, s_pos, pair_starts


def doc_term_counts(
    text_col: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Per-document term frequencies, vectorized.

    Returns ``(vocab, doc_idx, term_code, tf)`` where ``vocab`` is the
    batch-local dictionary (string array), and the three equal-length numpy
    arrays give, for each distinct (doc, term) pair: the document row index,
    the term's code in ``vocab``, and the term frequency.
    ``doc_len[i]`` is recoverable as ``bincount(doc_idx, weights=tf)``.
    """
    flat, doc_idx = tokenize_column(text_col)
    if len(flat) == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dic.dictionary
    nvocab = len(vocab)
    key = doc_idx * nvocab + codes
    uniq, counts = np.unique(key, return_counts=True)
    return vocab, uniq // nvocab, uniq % nvocab, counts.astype(np.int64)


def doc_ngrams(
    text_col: pa.Array | pa.ChunkedArray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """All token ``n``-grams per row, vectorized.

    Returns ``(grams, doc_idx)``: grams are the n consecutive tokens joined
    with single spaces (byte-identical to the SQL oracle's
    ``list_transform(list_slice(ts, 1, len(ts)-n+1), ...)`` join), doc_idx
    the source row per gram, in token order with multiplicity. Rows with
    fewer than ``n`` tokens emit nothing. The join runs through
    ``pc.binary_join_element_wise`` over n shifted slices of the flat token
    stream — no per-row Python."""
    flat, doc_idx = tokenize_column(text_col)
    ntok = len(flat)
    if ntok < n:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    starts = ntok - n + 1
    # an n-gram is valid iff its first and last token share a source row
    valid = doc_idx[:starts] == doc_idx[n - 1:]
    parts = [flat.slice(i, starts) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    mask = pa.array(valid)
    return grams.filter(mask), doc_idx[:starts][valid]


def doc_ngrams_pos(
    text_col: pa.Array | pa.ChunkedArray, n: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """``doc_ngrams`` plus each gram's 0-based START TOKEN position within
    its document — the occurrence-level view span-removal needs.
    Returns ``(grams, doc_idx, pos)``."""
    flat, doc_idx = tokenize_column(text_col)
    ntok = len(flat)
    empty = (pa.array([], type=pa.string()), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if ntok < n:
        return empty
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    starts = ntok - n + 1
    valid = doc_idx[:starts] == doc_idx[n - 1:]
    parts = [flat.slice(i, starts) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ").filter(pa.array(valid))
    gdoc = doc_idx[:starts][valid]
    gidx = np.flatnonzero(valid)
    # doc_idx is non-decreasing (tokens in row order), so each doc's first
    # token index is a searchsorted lookup
    pos = gidx - np.searchsorted(doc_idx, gdoc, side="left")
    return grams, gdoc, pos
