"""Deterministic, partition-invariant docID assignment.

``doc_id = blake2b(url)[0:8] & (2**63 - 1)`` — a pure function of the url, so
every artifact downstream (posting order, gaps, top-k tie-breaks) is
independent of partitioning and parallelism *without* a global sort shuffle.
The reference achieved rank stability with DB-precomputed ordinal columns
(reference GxdResultIndexer.java:860-891); a content hash is the shuffle-free
equivalent at web scale.

Collision note: 63-bit ids give ~5e-8 expected collisions at 1e6 docs and
only become material around 1e11+ docs; at true 1e12-document scale bump to
a 128-bit id (two uint64 columns) — the codec layer is width-agnostic since
gaps are over uint64 within doc-range shards.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MASK63 = (1 << 63) - 1


def doc_id_of(url: str) -> int:
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & _MASK63


def doc_id_column(url_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-enough docID column (hashing is per-row by nature)."""
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    out = np.empty(len(url_col), dtype=np.int64)
    blake2b = hashlib.blake2b
    for i, v in enumerate(url_col):
        h = blake2b(v.as_py().encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "big") & _MASK63
    return pa.array(out, type=pa.int64())
