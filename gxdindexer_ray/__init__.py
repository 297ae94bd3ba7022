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

__version__ = "0.1.0"
