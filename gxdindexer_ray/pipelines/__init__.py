from .build import build_index
from .incremental import append_index, compact_index, delete_docs
from .search import SearchEngine

__all__ = ["build_index", "append_index", "compact_index", "delete_docs", "SearchEngine"]
