"""Engine configuration.

All constants that affect on-disk artifacts are fixed here so that segment
bytes are a pure function of (input, config) — never of the parallelism
level. This is the determinism contract the reference got for free from
DB-precomputed ordinals (SURVEY.md §2.7 O1; GxdResultIndexer.java:860-891).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- BM25 scoring (Lucene-style, always-positive idf) ---
    k1: float = 0.9
    b: float = 0.4

    # --- posting layout ---
    block_size: int = 128          # postings per skip/block-max block
    n_buckets: int = 0             # segment files (groupby key space).
                                   # 0 (default) = auto: resolved at build
                                   # time to the next power of two of
                                   # N/31250, clamped to [32, 4096] —
                                   # derived from CORPUS SIZE (content),
                                   # never cluster size/parallelism, so the
                                   # segment-bytes invariance contract holds
                                   # while per-bucket merge working sets stay
                                   # ~constant as the corpus grows (measured:
                                   # 27% faster 2M build vs fixed 32,
                                   # BASELINE.md §3; resolves to the 32 floor
                                   # for any corpus <= 1M docs). An explicit
                                   # value pins the layout.

    # --- skew handling (SURVEY.md §7.3: salt hot terms) ---
    # A term is "hot" when its sampled document frequency exceeds
    # hot_df_ratio of sampled docs; its postings are then sharded by the top
    # `shard_bits` bits of doc_id (doc-range sharding -> shards concatenate
    # in shard order with strictly ascending docIDs, no second merge pass).
    hot_df_ratio: float = 0.10
    shard_bits: int = 5            # 32 shards per hot term
    hot_sample_target: int = 50_000  # deterministic hash-sample size for hot-term detection

    # --- positions (optional; enables index-resident phrase matching) ---
    store_positions: bool = False  # adds a per-posting position-gap stream
                                   # (~cf varints per segment); artifact-affecting

    # --- dedup ---
    dedup_buckets: int = 512       # url-hash buckets for exact first-wins dedup

    # --- merge memory bound (artifact-affecting: sets the segment file
    # split; derived ONLY from content-invariant posting counts) ---
    merge_max_postings: int = 32_000_000   # decoded postings per merge slot
                                           # (~24 B each + sort temporaries)

    # --- execution knobs (do NOT affect artifact bytes) ---
    batch_size: int = 8192         # docs per extract batch; one docstore file
                                   # per batch, so this also sets docstore file
                                   # granularity (html can be wide — bytes
                                   # bound it: ~8k x 10 KB ≈ 80 MB per task)
    spimi_batch_size: int = 16384  # docs per SPIMI batch (text only; larger batches
                                   # -> fewer, bigger partials -> cheaper shuffle+merge.
                                   # Interleaved A/B at 2M docs/32 CPUs: 16384 beat 4096
                                   # by 20-40% on the segments phase — 3.5x fewer partial
                                   # files and ~15% less map CPU — with LOWER per-worker
                                   # peak heap, 436 vs 668 MB max, since the builder's
                                   # temporaries amortize over more docs)
    extract_concurrency: int | None = None   # None -> stateless tasks sized by Ray
    min_rows_per_file: int = 100_000

    def shard_of(self, doc_id: int) -> int:
        return doc_id >> (63 - self.shard_bits)


DEFAULT_CONFIG = IndexConfig()
