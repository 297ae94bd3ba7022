from .build import build_index
from .search import SearchEngine

__all__ = ["build_index", "SearchEngine"]
