"""gxdindexer_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch re-expression of the capabilities of the reference indexer
(mgijax/gxdindexer: relational scan -> denormalized search documents -> Solr
full-text index) as idiomatic Ray Data pipelines over Apache Arrow batches:

- ``pipelines.build``  : pages parquet -> dedup -> extract -> tokenize ->
  SPIMI posting partials -> groupby-bucket shuffle -> merged immutable
  segment files (docID-gap varint compression, skip pointers, block-max
  metadata) + doc store + corpus stats, checkpoint-resumable per phase.
- ``query``            : BM25 top-k with block-max WAND over merged segments.
- ``ops``              : the reference's operator inventory (SURVEY.md section 2)
  re-expressed over Ray Data (broadcast joins, normalizers, dedup, grouped
  aggregation, ordinals/top-k) plus large-scale training-data operators
  (MinHash-LSH / SimHash near-dedup, ANN similarity search, text analysis,
  multimodal stubs).

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, or the driver).
"""

__version__ = "0.2.0"


def _tune_allocators() -> None:
    """Keep freed pages resident in BOTH allocators that back the hot path.

    Measured on this hardware class (BASELINE.md §3): the apparent
    "memory-bandwidth ceiling" under concurrency is dominated by page-fault
    handling for large FRESH allocations — glibc munmaps >128 KB frees and
    Arrow's jemalloc purges dirty pages after ~1 s, so every batch re-faults
    its working set and concurrent workers serialize in the kernel. Raising
    jemalloc's dirty-decay and glibc's mmap/trim thresholds makes workers
    reuse warm arenas; per-worker RSS grows by only the steady-state batch
    working set (bounded by batch_size). Runs at import, i.e. once in every
    Ray worker that imports any stage from this package.
    """
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(60_000)
    except Exception:
        pass  # non-jemalloc build: glibc tuning below still applies
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        # opt THIS process (and its children) out of transparent huge
        # pages: khugepaged/kcompactd churn on this VM class injects
        # multi-second stalls into wide runs (the observed 40s-vs-56s
        # variance on identical builds). prctl is process-scoped — no
        # system-wide setting is touched.
        PR_SET_THP_DISABLE = 41
        libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except Exception:
        pass


_tune_allocators()
