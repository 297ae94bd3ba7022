from .bm25 import idf, bm25_params
from .wand import block_max_wand_topk
from .brute import brute_force_topk

__all__ = ["idf", "bm25_params", "block_max_wand_topk", "brute_force_topk"]
