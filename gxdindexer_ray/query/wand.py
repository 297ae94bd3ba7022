"""Block-Max WAND top-k BM25 over block-structured posting rows.

Standard BMW (Ding & Suel, "Faster top-k document retrieval using block-max
indexes", SIGIR 2011), adapted for:

- doc-range shards: a hot term's (term, shard) rows are independent cursors
  with the same idf — shards are docID-disjoint, so WAND semantics hold;
- exact rank-identity with the oracle: ties broken (score desc, doc_id asc);
  the threshold is a *strict* bound (skip only when upper bound < threshold)
  so score-equal candidates still get evaluated and win on smaller doc_id;
  full evaluation sums contributions in sorted-term order so float64 sums
  are bit-identical to the oracle's accumulation.

Blocks are decoded lazily via the skip table: a deep seek only decodes the
destination block.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..codecs.postings import decode_block
from .bm25 import idf, tf_factor
from .brute import term_rows_df

_EXHAUSTED = 1 << 63


class _Cursor:
    __slots__ = (
        "term", "shard", "row", "w", "skip_last", "block_max", "n_blocks",
        "block_size", "max_score", "cur_block", "idx", "docs", "tfs", "dls", "doc",
    )

    def __init__(self, term: str, row: dict, w: float, block_size: int):
        self.term = term
        self.shard = int(row["shard"])
        self.row = row
        self.w = w
        self.block_size = block_size
        self.skip_last = np.asarray(row["skip_last_doc"], dtype=np.int64)
        self.block_max = np.asarray(row["block_max"], dtype=np.float64)
        self.n_blocks = self.skip_last.size
        self.max_score = w * float(self.block_max.max())
        self.cur_block = -1
        self.idx = 0
        self.docs = self.tfs = self.dls = None
        self.doc = _EXHAUSTED
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        # a block can decode EMPTY when every posting in it is tombstoned
        # (codecs.decode_block masks row["_dead"]) — skip to the next one
        while b < self.n_blocks:
            pl = decode_block(self.row, b, block_size=self.block_size)
            if pl.doc_ids.size:
                self.cur_block = b
                self.docs = pl.doc_ids.astype(np.int64)
                self.tfs = pl.tfs
                self.dls = pl.dls
                self.idx = 0
                self.doc = int(self.docs[0])
                return
            b += 1
        self.doc = _EXHAUSTED

    def next(self) -> None:
        self.idx += 1
        if self.idx < self.docs.size:
            self.doc = int(self.docs[self.idx])
        else:
            self._load_block(self.cur_block + 1)

    def seek(self, target: int) -> None:
        """Advance to first doc >= target."""
        if self.doc >= target:
            return
        b = int(np.searchsorted(self.skip_last, target, side="left"))
        if b >= self.n_blocks:
            self.doc = _EXHAUSTED
            return
        if b != self.cur_block:
            self._load_block(b)
            if self.doc == _EXHAUSTED:
                return
            if self.cur_block > b:
                # landed past the target block (it was fully tombstoned):
                # every doc here already exceeds skip_last[b] >= target
                return
        i = int(np.searchsorted(self.docs, target, side="left"))
        if i >= self.docs.size:
            # masked tail: the block's surviving docs all precede target
            self._load_block(self.cur_block + 1)
            return
        self.idx = i
        self.doc = int(self.docs[i])

    def block_ub(self, target: int) -> tuple[float, int]:
        """(idf-weighted block-max score, block last doc) for the block that
        would contain ``target``; (0, EXHAUSTED) when past the end."""
        b = int(np.searchsorted(self.skip_last, target, side="left"))
        if b >= self.n_blocks:
            return 0.0, _EXHAUSTED
        return self.w * float(self.block_max[b]), int(self.skip_last[b])

    def score_current(self, k1: float, b: float, avgdl: float) -> float:
        return self.w * tf_factor(float(self.tfs[self.idx]), float(self.dls[self.idx]), k1, b, avgdl)


def block_max_wand_topk(
    term_rows: dict[str, list[dict]],
    *,
    N: int,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    k: int,
    boosts: dict[str, float] | None = None,
) -> list[tuple[int, float]]:
    cursors: list[_Cursor] = []
    for term in sorted(term_rows):
        rows = sorted(term_rows[term], key=lambda r: int(r["shard"]))
        df = term_rows_df(rows)
        if df == 0:
            continue
        w = idf(N, df) * (boosts.get(term, 1.0) if boosts else 1.0)
        for r in rows:
            cursors.append(_Cursor(term, r, w, block_size))
    cursors = [c for c in cursors if c.doc != _EXHAUSTED]
    if not cursors or k <= 0:
        return []

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        cursors = [c for c in cursors if c.doc != _EXHAUSTED]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.doc)
        theta = threshold()

        # --- pivot selection (WAND): first prefix whose UB sum can qualify
        acc = 0.0
        p = -1
        for i, c in enumerate(cursors):
            acc += c.max_score
            if acc >= theta:
                p = i
                break
        if p < 0:
            break  # no remaining doc can enter the top-k
        pivot_doc = cursors[p].doc
        # extend pivot over cursors positioned exactly at pivot_doc
        while p + 1 < len(cursors) and cursors[p + 1].doc == pivot_doc:
            p += 1

        if cursors[0].doc == pivot_doc:
            # --- block-max refinement (BMW)
            ub = 0.0
            min_boundary = _EXHAUSTED
            for c in cursors[: p + 1]:
                s, last = c.block_ub(pivot_doc)
                ub += s
                min_boundary = min(min_boundary, last)
            if ub < theta:
                # no doc in [pivot_doc, min_boundary] can qualify — deep skip
                d = min_boundary + 1
                if p + 1 < len(cursors):
                    d = min(d, cursors[p + 1].doc)
                d = max(d, pivot_doc + 1)
                target = max(cursors[: p + 1], key=lambda c: c.max_score)
                target.seek(d)
                continue
            # --- full evaluation, sorted-term order for float determinism
            matching = [c for c in cursors if c.doc == pivot_doc]
            matching.sort(key=lambda c: (c.term, c.shard))
            score = 0.0
            for c in matching:
                score += c.score_current(k1, b, avgdl)
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            for c in matching:
                c.next()
        else:
            # advance the highest-impact cursor below the pivot
            below = [c for c in cursors[: p + 1] if c.doc < pivot_doc]
            target = max(below, key=lambda c: c.max_score)
            target.seek(pivot_doc)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]
