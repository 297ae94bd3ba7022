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

from ..codecs.postings import encode_postings_bulk_arrow
from ..codecs.varint import varint_decode, varint_encode_segments
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
        pa.field("pos_payload", pa.large_binary()),  # null when positions disabled
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


def merge_bucket_files(bucket_files: list[str], segments_dir: str, avgdl: float,
                       cfg: IndexConfig | None = None, *,
                       total_postings: int | None = None) -> dict:
    """Reducer for the file-based exchange: read one bucket's partial files,
    merge, write its segment(s). Run as one Ray task per bucket
    (``ray.remote(merge_bucket_files)``) — this is the rare drop below the
    Dataset API: a 32-way fixed fan-out that the groupby sort shuffle would
    only make slower. Returns the bucket's lineage/manifest row.

    Memory bound: the decoded working set (~24 B/posting + sort
    temporaries) is capped by splitting oversized buckets into term-hash
    SLOTS merged one at a time (cfg.merge_max_postings per slot). The
    split count derives from the bucket's total n_postings — a pure
    function of corpus content, never of batching or parallelism — so the
    segment file set stays deterministic. Compressed payloads are slot-
    bounded too: partials are written rslot-sorted (spimi.py) and each
    slot reads only its own row groups via parquet min/max stats, so
    nothing bucket-sized is ever resident. The split count comes from
    ``total_postings`` (the SPIMI writers' manifest sums) when the caller
    has it; otherwise one cheap n_postings column pass derives it."""
    cfg = cfg or IndexConfig()
    files = sorted(bucket_files)
    merger = BucketMerger(segments_dir=segments_dir, avgdl=avgdl, cfg=cfg)
    if total_postings is None:
        total_postings = 0
        for f in files:
            col = pq.read_table(f, columns=["n_postings"])["n_postings"]
            total_postings += int(pa.compute.sum(col).as_py() or 0)
    slots = 1
    while slots < 64 and total_postings / slots > cfg.merge_max_postings:
        slots *= 2
    if slots == 1:
        tbl = pa.concat_tables(pq.read_table(f) for f in files)
        return merger(tbl).to_pylist()[0]

    pfs = [pq.ParquetFile(f) for f in files]
    # Invariant: one bucket's partials are always written by a single code
    # version in one build phase (_segments_phase rmtree's .partials.tmp
    # before rewriting), so a bucket never MIXES rslot and pre-rslot files —
    # the two branches below need not handle a hybrid schema.
    have_rslot = all("rslot" in pf.schema_arrow.names for pf in pfs)
    rows = []
    if have_rslot:
        # slot s = {terms : slot_byte & (slots-1) == s} is the contiguous
        # rslot range [rev_k(s), rev_k(s)+1) << (6-k) — see spimi._REV6
        k = slots.bit_length() - 1
        width = 64 >> k
        for s in range(slots):
            rev = int(f"{s:0{k}b}"[::-1], 2) if k else 0
            lo, hi = rev * width, rev * width + width
            parts = []
            for pf in pfs:
                ci = pf.schema_arrow.names.index("rslot")
                gs = []
                for g in range(pf.metadata.num_row_groups):
                    st = pf.metadata.row_group(g).column(ci).statistics
                    if st is None or st.min is None or (st.min < hi and st.max >= lo):
                        gs.append(g)
                if gs:
                    parts.append(pf.read_row_groups(gs))
            if not parts:
                continue
            sub = pa.concat_tables(parts)
            rs = sub["rslot"]
            sub = sub.filter(pa.compute.and_(
                pa.compute.greater_equal(rs, lo), pa.compute.less(rs, hi)))
            if sub.num_rows == 0:
                continue
            rows.append(merger(sub, file_suffix=f"-{s:02d}").to_pylist()[0])
    else:
        # partials from a pre-rslot layout: legacy whole-bucket path
        import hashlib

        tbl = pa.concat_tables(pf.read() for pf in pfs)
        terms = tbl["term"].to_pylist()
        slot_of: dict = {}
        slot_ids = np.empty(len(terms), np.int8)
        for i, t in enumerate(terms):
            s = slot_of.get(t)
            if s is None:
                s = hashlib.blake2b(t.encode(), digest_size=2).digest()[0] & (slots - 1)
                slot_of[t] = s
            slot_ids[i] = s
        for s in range(slots):
            sub = tbl.filter(pa.array(slot_ids == s))
            if sub.num_rows == 0:
                continue
            rows.append(merger(sub, file_suffix=f"-{s:02d}").to_pylist()[0])
    agg = dict(rows[0])
    agg.update(
        n_terms=sum(r["n_terms"] for r in rows),
        n_rows=sum(r["n_rows"] for r in rows),
        n_postings=sum(r["n_postings"] for r in rows),
        bytes_in=sum(r["bytes_in"] for r in rows),
        bytes_out=sum(r["bytes_out"] for r in rows),
        path=";".join(r["path"] for r in rows),
    )
    return agg


class BucketMerger:
    """map_groups callable. Stateless besides config; written as a class so
    segments_dir/avgdl arrive once via fn_constructor_kwargs."""

    def __init__(self, segments_dir: str, avgdl: float, cfg: IndexConfig | None = None):
        self.segments_dir = Path(segments_dir)
        self.avgdl = float(avgdl)
        self.cfg = cfg or IndexConfig()

    def __call__(self, group: pa.Table, file_suffix: str = "") -> pa.Table:
        cfg = self.cfg
        bucket = int(group["bucket"][0].as_py())
        terms = group["term"].to_pylist()
        shards = group["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_post = group["n_postings"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_pay = group["docs_payload"].to_pylist()
        t_pay = group["tfs_payload"].to_pylist()
        l_pay = group["dls_payload"].to_pylist()
        n_rows = len(terms)
        pos_in = group["pos_payload"].to_pylist() if "pos_payload" in group.column_names else []
        bytes_in = sum(len(d_pay[i]) + len(t_pay[i]) + len(l_pay[i]) for i in range(n_rows))
        bytes_in += sum(len(p) for p in pos_in if p is not None)

        # Vectorized bulk decode: 3 varint_decode calls for the WHOLE bucket
        # (per-partial decode costs ~3 numpy calls x millions of partials).
        total = int(n_post.sum())
        gaps_all = varint_decode(b"".join(d_pay), count=total)
        tfs_all = varint_decode(b"".join(t_pay), count=total)
        dls_all = varint_decode(b"".join(l_pay), count=total)
        ends = np.cumsum(n_post)
        starts = ends - n_post
        # per-partial doc_ids: global cumsum minus each partial's base offset
        cs = np.cumsum(gaps_all, dtype=np.uint64)
        base = np.zeros(n_rows, dtype=np.uint64)
        base[1:] = cs[ends[:-1] - 1]
        docs_all = cs - np.repeat(base, n_post)

        # one global posting-level sort by (term, shard, doc): term codes are
        # ranks in the sorted unique-term order, so output row order is the
        # deterministic (term asc, shard asc) regardless of arrival order
        uniq_terms, codes_row = np.unique(np.asarray(terms, dtype=object), return_inverse=True)
        codes_post = np.repeat(codes_row, n_post)
        shards_post = np.repeat(shards, n_post)
        order = np.lexsort((docs_all, shards_post, codes_post))
        docs_s = docs_all[order]
        tfs_s = tfs_all[order]
        dls_s = dls_all[order]
        codes_s = codes_post[order]
        shards_s = shards_post[order]

        # segment boundaries where (term, shard) changes
        if total == 0:
            return pa.table({k: pa.array([], f.type) for k, f in zip(MANIFEST_SCHEMA.names, MANIFEST_SCHEMA)},
                            schema=MANIFEST_SCHEMA)
        change = np.empty(total, dtype=bool)
        change[0] = True
        change[1:] = (np.diff(codes_s) != 0) | (np.diff(shards_s) != 0)
        seg_starts = np.flatnonzero(change)

        cols = encode_postings_bulk_arrow(
            docs_s, tfs_s, dls_s, seg_starts,
            block_size=cfg.block_size, avgdl=self.avgdl, k1=cfg.k1, b=cfg.b,
        )

        # --- optional position stream: decode, permute per the posting
        # order (variable-length gather via repeat arithmetic), re-encode
        pos_slices = None
        p_pay = group["pos_payload"].to_pylist() if "pos_payload" in group.column_names else []
        if p_pay and all(p is not None for p in p_pay):
            tfs_i = tfs_all.astype(np.int64)
            total_pos = int(tfs_i.sum())
            gaps_p = varint_decode(b"".join(p_pay), count=total_pos)
            value_starts = np.concatenate([[0], np.cumsum(tfs_i)])[:-1]
            cs_p = np.cumsum(gaps_p, dtype=np.uint64)
            base_p = np.zeros(total, dtype=np.uint64)
            nz = value_starts > 0
            base_p[nz] = cs_p[value_starts[nz] - 1]
            abs_pos = cs_p - np.repeat(base_p, tfs_i)
            tf_o = tfs_i[order]
            out_off = np.concatenate([[0], np.cumsum(tf_o)])
            rep = np.repeat(value_starts[order], tf_o)
            within = np.arange(total_pos, dtype=np.int64) - np.repeat(out_off[:-1], tf_o)
            pos_s = abs_pos[rep + within]
            gaps_n = pos_s.copy()
            gaps_n[1:] -= pos_s[:-1]
            pair_starts_n = out_off[:-1]
            gaps_n[pair_starts_n] = pos_s[pair_starts_n]
            pos_seg_starts = out_off[seg_starts]
            p_buf, p_off = varint_encode_segments(gaps_n, pos_seg_starts)
            pos_slices = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), seg_starts.size,
                [None, pa.py_buffer(np.ascontiguousarray(p_off, dtype=np.int64)),
                 pa.py_buffer(p_buf)])
        seg_terms = uniq_terms[codes_s[seg_starts]].tolist()
        seg_shards = shards_s[seg_starts].astype(np.int32)
        total_postings = total

        seg = pa.table(
            {
                "term": pa.array(seg_terms, pa.string()),
                "shard": pa.array(seg_shards, pa.int32()),
                "df": cols["df"],
                "cf": cols["cf"],
                "n_postings": cols["n_postings"],
                "min_doc": cols["min_doc"],
                "max_doc": cols["max_doc"],
                "docs_payload": cols["docs_payload"],
                "tfs_payload": cols["tfs_payload"],
                "dls_payload": cols["dls_payload"],
                "skip_last_doc": cols["skip_last_doc"],
                "skip_doc_off": cols["skip_doc_off"],
                "skip_tf_off": cols["skip_tf_off"],
                "skip_dl_off": cols["skip_dl_off"],
                "block_max": cols["block_max"],
                "pos_payload": (pos_slices if pos_slices is not None
                                else pa.array([None] * seg_starts.size,
                                              pa.large_binary())),
            },
            schema=SEGMENT_SCHEMA,
        )
        self.segments_dir.mkdir(parents=True, exist_ok=True)
        final = self.segments_dir / f"bucket-{bucket:05d}{file_suffix}.parquet"
        tmp = self.segments_dir / f".bucket-{bucket:05d}{file_suffix}.parquet.tmp"
        pq.write_table(seg, tmp, compression="zstd", row_group_size=256)
        tmp.rename(final)

        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "n_terms": pa.array([len(set(terms))], pa.int64()),
                "n_rows": pa.array([seg.num_rows], pa.int64()),
                "n_postings": pa.array([total_postings], pa.int64()),
                "bytes_in": pa.array([bytes_in], pa.int64()),
                "bytes_out": pa.array([final.stat().st_size], pa.int64()),
                "path": pa.array([str(final)], pa.string()),
            },
            schema=MANIFEST_SCHEMA,
        )
