"""Bucket-level posting merge: the groupby shuffle reducer.

``groupby("bucket").map_groups(BucketMerger)`` — one group per segment
bucket (n_buckets is FIXED in config, never derived from cluster size, so
segment bytes are parallelism-invariant). Within a bucket the merge is
vectorized per (term, shard): decode partial payloads, concatenate, argsort
by docID (partials from different batches interleave across the hash-docID
space; docs are unique per term after url dedup), re-encode with skip
pointers + block-max, and write the bucket's immutable segment file
tmp+rename. This k-way merge into immutable segments *is* the reference's
delegated Solr merge/optimize step (reference Indexer.java:136-148).

Returns one manifest row per bucket (lineage + metrics: n_terms,
n_postings, payload bytes in = bytes shuffled, bytes out).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs.postings import PostingList, encode_postings
from ..codecs.varint import varint_decode
from ..config import IndexConfig

SEGMENT_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("shard", pa.int32()),
        pa.field("df", pa.int64()),
        pa.field("cf", pa.int64()),
        pa.field("n_postings", pa.int64()),
        pa.field("min_doc", pa.int64()),
        pa.field("max_doc", pa.int64()),
        pa.field("docs_payload", pa.large_binary()),
        pa.field("tfs_payload", pa.large_binary()),
        pa.field("dls_payload", pa.large_binary()),
        pa.field("skip_last_doc", pa.list_(pa.int64())),
        pa.field("skip_doc_off", pa.list_(pa.int64())),
        pa.field("skip_tf_off", pa.list_(pa.int64())),
        pa.field("skip_dl_off", pa.list_(pa.int64())),
        pa.field("block_max", pa.list_(pa.float32())),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("n_terms", pa.int64()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_postings", pa.int64()),
        pa.field("bytes_in", pa.int64()),
        pa.field("bytes_out", pa.int64()),
        pa.field("path", pa.string()),
    ]
)


class BucketMerger:
    """map_groups callable. Stateless besides config; written as a class so
    segments_dir/avgdl arrive once via fn_constructor_kwargs."""

    def __init__(self, segments_dir: str, avgdl: float, cfg: IndexConfig | None = None):
        self.segments_dir = Path(segments_dir)
        self.avgdl = float(avgdl)
        self.cfg = cfg or IndexConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        bucket = int(group["bucket"][0].as_py())
        terms = group["term"].to_pylist()
        shards = group["shard"].to_numpy(zero_copy_only=False)
        n_post = group["n_postings"].to_numpy(zero_copy_only=False)
        d_pay = group["docs_payload"].to_pylist()
        t_pay = group["tfs_payload"].to_pylist()
        l_pay = group["dls_payload"].to_pylist()

        # deterministic processing order: sort partial rows by (term, shard)
        order = sorted(range(len(terms)), key=lambda i: (terms[i], int(shards[i])))
        bytes_in = sum(len(d_pay[i]) + len(t_pay[i]) + len(l_pay[i]) for i in range(len(terms)))

        out_rows: list[dict] = []
        i = 0
        total_postings = 0
        while i < len(order):
            j = i
            key = (terms[order[i]], int(shards[order[i]]))
            docs_parts, tfs_parts, dls_parts = [], [], []
            while j < len(order) and (terms[order[j]], int(shards[order[j]])) == key:
                r = order[j]
                n = int(n_post[r])
                gaps = varint_decode(d_pay[r], count=n)
                docs_parts.append(np.cumsum(gaps, dtype=np.uint64))
                tfs_parts.append(varint_decode(t_pay[r], count=n))
                dls_parts.append(varint_decode(l_pay[r], count=n))
                j += 1
            docs = np.concatenate(docs_parts)
            tfs = np.concatenate(tfs_parts)
            dls = np.concatenate(dls_parts)
            srt = np.argsort(docs, kind="stable")
            docs, tfs, dls = docs[srt], tfs[srt], dls[srt]
            if docs.size > 1 and np.any(docs[1:] == docs[:-1]):
                raise ValueError(f"duplicate doc_id in postings of {key} (dedup failed?)")
            row = encode_postings(
                PostingList(docs, tfs, dls),
                block_size=cfg.block_size, avgdl=self.avgdl, k1=cfg.k1, b=cfg.b,
            )
            row["term"], row["shard"] = key
            row["df"] = int(docs.size)
            row["cf"] = int(tfs.sum())
            out_rows.append(row)
            total_postings += int(docs.size)
            i = j

        seg = pa.Table.from_pylist(out_rows, schema=SEGMENT_SCHEMA)
        self.segments_dir.mkdir(parents=True, exist_ok=True)
        final = self.segments_dir / f"bucket-{bucket:05d}.parquet"
        tmp = self.segments_dir / f".bucket-{bucket:05d}.parquet.tmp"
        pq.write_table(seg, tmp, compression="zstd", row_group_size=4096)
        tmp.rename(final)

        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "n_terms": pa.array([len(set(terms))], pa.int64()),
                "n_rows": pa.array([len(out_rows)], pa.int64()),
                "n_postings": pa.array([total_postings], pa.int64()),
                "bytes_in": pa.array([bytes_in], pa.int64()),
                "bytes_out": pa.array([final.stat().st_size], pa.int64()),
                "path": pa.array([str(final)], pa.string()),
            },
            schema=MANIFEST_SCHEMA,
        )
