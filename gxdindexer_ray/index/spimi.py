"""Per-partition SPIMI posting construction as a stateful ``map_batches`` stage.

One batch of (doc_id, text) rows in, one Arrow table of compressed posting
*partials* out — the partial/combiner before the groupby-bucket shuffle
(SURVEY.md §2.6 A6): postings are gap+varint-compressed per (term[, shard])
*before* they move, so the all-to-all exchange ships bytes, not exploded
(term, doc, tf) rows.

Skew handling: terms in the broadcast hot set (detected from a deterministic
doc_id hash-sample) are sharded by the top ``shard_bits`` bits of doc_id.
Shards are docID-range-disjoint, so a hot term's merged shards concatenate
in shard order with globally ascending docIDs — no second merge pass
(SURVEY.md §7.3). The shuffle key is ``bucket = blake2b(term, shard) %
n_buckets`` which also spreads one hot term's shards across reducers.

The actor receives the hot-term set once in ``__init__`` (ray.put broadcast
— the reference's cache-loaded-once pattern, shr/TermAssociationCache.java:1-83).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs.varint import varint_encode
from ..config import IndexConfig
from ..text.tokenize import doc_term_counts

PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("term", pa.string()),
        pa.field("shard", pa.int32()),
        pa.field("n_postings", pa.int64()),
        pa.field("docs_payload", pa.large_binary()),
        pa.field("tfs_payload", pa.large_binary()),
        pa.field("dls_payload", pa.large_binary()),
    ]
)


def bucket_of(term: str, shard: int, n_buckets: int) -> int:
    h = hashlib.blake2b(f"{term}\x00{shard}".encode(), digest_size=4).digest()
    return int.from_bytes(h, "big") % n_buckets


class SpimiPartialBuilder:
    def __init__(self, hot_terms_ref=None, cfg: IndexConfig | None = None):
        import ray

        self.cfg = cfg or IndexConfig()
        if hot_terms_ref is None:
            self.hot = frozenset()
        else:
            hot = ray.get(hot_terms_ref) if isinstance(hot_terms_ref, ray.ObjectRef) else hot_terms_ref
            self.hot = frozenset(hot)
        self._bucket_cache: dict[tuple[str, int], int] = {}

    def _bucket(self, term: str, shard: int) -> int:
        key = (term, shard)
        b = self._bucket_cache.get(key)
        if b is None:
            b = bucket_of(term, shard, self.cfg.n_buckets)
            self._bucket_cache[key] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # sort docs so per-term doc_ids come out ascending
        order = pc.sort_indices(batch["doc_id"])
        batch = batch.take(order)
        docs = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

        vocab, doc_idx, codes, tf = doc_term_counts(batch["text"])
        if len(vocab) == 0:
            return PARTIAL_SCHEMA.empty_table()
        dls = np.bincount(doc_idx, weights=tf, minlength=len(docs)).astype(np.int64)

        srt = np.lexsort((doc_idx, codes))
        s_codes = codes[srt]
        s_docidx = doc_idx[srt]
        s_tf = tf[srt]
        term_starts = np.concatenate([[0], np.flatnonzero(np.diff(s_codes)) + 1, [s_codes.size]])
        vlist = vocab.to_pylist()
        shard_shift = np.uint64(63 - cfg.shard_bits)

        cols: dict[str, list] = {k: [] for k in ("bucket", "term", "shard", "n_postings",
                                                 "docs_payload", "tfs_payload", "dls_payload")}

        def emit(term: str, shard: int, d: np.ndarray, t: np.ndarray, l: np.ndarray) -> None:
            gaps = np.empty(d.size, dtype=np.uint64)
            gaps[0] = d[0]
            gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
            cols["bucket"].append(self._bucket(term, shard))
            cols["term"].append(term)
            cols["shard"].append(shard)
            cols["n_postings"].append(d.size)
            cols["docs_payload"].append(varint_encode(gaps))
            cols["tfs_payload"].append(varint_encode(t.astype(np.uint64)))
            cols["dls_payload"].append(varint_encode(l.astype(np.uint64)))

        for i in range(term_starts.size - 1):
            s, e = int(term_starts[i]), int(term_starts[i + 1])
            term = vlist[int(s_codes[s])]
            di = s_docidx[s:e]
            d = docs[di]
            t = s_tf[s:e]
            l = dls[di]
            if term in self.hot:
                shards = (d.astype(np.uint64) >> shard_shift).astype(np.int64)
                sb = np.concatenate([[0], np.flatnonzero(np.diff(shards)) + 1, [shards.size]])
                for j in range(sb.size - 1):
                    a, z = int(sb[j]), int(sb[j + 1])
                    emit(term, int(shards[a]), d[a:z], t[a:z], l[a:z])
            else:
                emit(term, 0, d, t, l)

        return pa.table(
            {
                "bucket": pa.array(cols["bucket"], pa.int32()),
                "term": pa.array(cols["term"], pa.string()),
                "shard": pa.array(cols["shard"], pa.int32()),
                "n_postings": pa.array(cols["n_postings"], pa.int64()),
                "docs_payload": pa.array(cols["docs_payload"], pa.large_binary()),
                "tfs_payload": pa.array(cols["tfs_payload"], pa.large_binary()),
                "dls_payload": pa.array(cols["dls_payload"], pa.large_binary()),
            },
            schema=PARTIAL_SCHEMA,
        )
