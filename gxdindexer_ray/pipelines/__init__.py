from .build import build_index
from .incremental import append_index, compact_index
from .search import SearchEngine

__all__ = ["build_index", "append_index", "compact_index", "SearchEngine"]
