"""Block-structured posting-list codec: docID gaps + varint, skip pointers,
block-max metadata.

Layout (per term, or per (term, shard) for hot terms):

- postings are split into blocks of ``block_size`` entries;
- ``docs`` stream: per-block LEB128 gaps. The first gap of block *i* is
  relative to the last docID of block *i-1* (0 for the first block), so a
  block can be decoded independently given the skip table;
- ``tfs`` / ``dls`` streams: per-block LEB128 of term frequency and document
  length (dl travels with the posting so BM25 needs no random-access norms
  file — docIDs are url hashes, not dense ordinals);
- skip table (kept as Arrow list columns, not packed bytes):
  ``skip_last_doc[i]`` = last docID of block i, ``skip_{doc,tf,dl}_off[i]`` =
  byte offset of block i in each stream;
- ``block_max[i]`` = max over block i of the dl-normalized BM25 term factor
  ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` (idf is applied at query time, so
  block-max bounds survive df changes from shard summation).

The reference's engine delegated all of this to Solr/Lucene
(reference Indexer.java:236-247 just ships documents); this module is the
from-scratch replacement required by the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .varint import varint_encode, varint_decode


@dataclass
class PostingList:
    """Decoded, in-memory posting list (docIDs strictly ascending)."""

    doc_ids: np.ndarray  # uint64
    tfs: np.ndarray      # uint64
    dls: np.ndarray      # uint64

    def __len__(self) -> int:
        return int(self.doc_ids.size)


def bm25_tf_factor(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """dl-normalized BM25 term factor (float64; idf excluded)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * (dl / avgdl))
    return tf * (k1 + 1.0) / denom


def encode_postings(
    pl: PostingList,
    *,
    block_size: int,
    avgdl: float,
    k1: float,
    b: float,
) -> dict:
    """Encode one posting list into the segment-row payload dict.

    Returns a dict of python values suitable for one Arrow row:
    docs/tfs/dls payload bytes, skip arrays, block-max array.
    """
    n = len(pl)
    if n == 0:
        raise ValueError("empty posting list")
    docs = np.ascontiguousarray(pl.doc_ids, dtype=np.uint64)
    if n > 1 and not bool(np.all(docs[1:] > docs[:-1])):
        raise ValueError("doc_ids must be strictly ascending")

    n_blocks = (n + block_size - 1) // block_size
    starts = np.arange(n_blocks, dtype=np.int64) * block_size
    ends = np.minimum(starts + block_size, n)

    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = docs[0]
    gaps[1:] = docs[1:] - docs[:-1]
    # first gap of each block is relative to previous block's last doc —
    # already true for the plain diff except block 0 (relative to 0): also true.

    docs_parts: list[bytes] = []
    tfs_parts: list[bytes] = []
    dls_parts: list[bytes] = []
    doc_off = np.zeros(n_blocks, dtype=np.int64)
    tf_off = np.zeros(n_blocks, dtype=np.int64)
    dl_off = np.zeros(n_blocks, dtype=np.int64)
    pos_d = pos_t = pos_l = 0
    for i in range(n_blocks):
        s, e = int(starts[i]), int(ends[i])
        db = varint_encode(gaps[s:e])
        tb = varint_encode(pl.tfs[s:e])
        lb = varint_encode(pl.dls[s:e])
        doc_off[i], tf_off[i], dl_off[i] = pos_d, pos_t, pos_l
        pos_d += len(db); pos_t += len(tb); pos_l += len(lb)
        docs_parts.append(db); tfs_parts.append(tb); dls_parts.append(lb)

    factors = bm25_tf_factor(np.asarray(pl.tfs, dtype=np.uint64), np.asarray(pl.dls, dtype=np.uint64), avgdl, k1, b)
    bm64 = np.maximum.reduceat(factors, starts)
    block_max = bm64.astype(np.float32)
    # float32 narrowing may round DOWN — bump to keep a valid upper bound
    rounded_low = block_max.astype(np.float64) < bm64
    block_max[rounded_low] = np.nextafter(block_max[rounded_low], np.float32(np.inf))
    skip_last = docs[ends - 1].astype(np.uint64)

    return {
        "n_postings": n,
        "min_doc": int(docs[0]),
        "max_doc": int(docs[-1]),
        "docs_payload": b"".join(docs_parts),
        "tfs_payload": b"".join(tfs_parts),
        "dls_payload": b"".join(dls_parts),
        "skip_last_doc": skip_last.astype(np.int64).tolist(),
        "skip_doc_off": doc_off.tolist(),
        "skip_tf_off": tf_off.tolist(),
        "skip_dl_off": dl_off.tolist(),
        "block_max": block_max.tolist(),
    }


def decode_postings(row: dict, *, block_size: int) -> PostingList:
    """Decode a full posting list from a segment-row payload dict."""
    n = int(row["n_postings"])
    gaps = varint_decode(row["docs_payload"], count=n)
    tfs = varint_decode(row["tfs_payload"], count=n)
    dls = varint_decode(row["dls_payload"], count=n)
    doc_ids = np.cumsum(gaps, dtype=np.uint64)
    return PostingList(doc_ids=doc_ids, tfs=tfs, dls=dls)


def decode_block(row: dict, block: int, *, block_size: int) -> PostingList:
    """Decode a single block (for block-max WAND's lazy deep pointer moves)."""
    n = int(row["n_postings"])
    n_blocks = (n + block_size - 1) // block_size
    if not (0 <= block < n_blocks):
        raise IndexError(block)
    s = block * block_size
    cnt = min(block_size, n - s)
    d_off = row["skip_doc_off"]
    t_off = row["skip_tf_off"]
    l_off = row["skip_dl_off"]

    def sl(payload, offs, i):
        end = offs[i + 1] if i + 1 < n_blocks else len(payload)
        return payload[offs[i]:end]

    gaps = varint_decode(sl(row["docs_payload"], d_off, block), count=cnt)
    tfs = varint_decode(sl(row["tfs_payload"], t_off, block), count=cnt)
    dls = varint_decode(sl(row["dls_payload"], l_off, block), count=cnt)
    base = np.uint64(0) if block == 0 else np.uint64(row["skip_last_doc"][block - 1])
    doc_ids = base + np.cumsum(gaps, dtype=np.uint64)
    return PostingList(doc_ids=doc_ids, tfs=tfs, dls=dls)
