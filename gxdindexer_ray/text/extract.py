"""Frozen HTML -> text extraction spec (version 2).

The north rule requires *byte-identical extracted text per url* at every
parallelism level, so extraction is a frozen pure function — the analog of
the reference's deterministic per-row field derivations
(reference GxdResultIndexer.java:979-1247). Spec v2:

1. null/empty html -> "".
2. one left-to-right scan replaces, earliest-match-first:
   <script>...</script> / <style>...</style> blocks (case-insensitive,
   incl. attributes, dotall), <!-- comments -->, and every remaining tag
   ``<...>`` — each with a single space. (v1 ran these as four sequential
   passes; v2's single ordered-alternation pass is ~3x faster and differs
   only on pathologically nested markup, which is why the spec version is
   bumped rather than silently swapped.)
3. bytes decoded as UTF-8 with errors="replace" (deterministic; no charset
   sniffing).
4. HTML entities unescaped (after tag removal, so ``&lt;`` never becomes a
   tag).
5. whitespace normalized: split on any whitespace run, join with one space.

Regexes are compiled once at import (module-level), which is the
stateless-task analogue of actor-``__init__`` state.

Engineering note (measured, round 2): a fully vectorized Arrow-RE2 +
numpy-whitespace-collapse column path was built and property-tested
byte-identical, then REJECTED on measurement: on this class of hardware
the scalar loop runs 0.30s vs 0.59s per 21 MB batch and, critically,
scales FLAT to 8 concurrent processes, while the vectorized path's large
fresh buffer allocations serialize on page-fault handling (the real
"bandwidth ceiling" seen in BASELINE.md §3 is allocator page faults, not
DRAM). The per-row loop's small allocations recycle through CPython's
pools and never fault. Kernel-level vectorization is not free when every
batch allocates ~6x its size in fresh pages; see bench.py's allocator
env tuning for the complementary fix.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

EXTRACT_SPEC_VERSION = 2

_MARKUP_RE = re.compile(
    rb"<script\b[^>]*>.*?</script\s*>"
    rb"|<style\b[^>]*>.*?</style\s*>"
    rb"|<!--.*?-->"
    rb"|<[^>]*>",
    re.IGNORECASE | re.DOTALL,
)


def extract_text(html_bytes: bytes | None) -> str:
    """Extract visible text from raw html bytes. Pure, deterministic, frozen."""
    if html_bytes is None or len(html_bytes) == 0:
        return ""
    h = _MARKUP_RE.sub(b" ", html_bytes)
    s = h.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return " ".join(s.split())


def extract_column(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Column wrapper for a ``binary`` Arrow column.

    HTML parsing is inherently per-document; the per-row loop here runs over
    zero-copy buffer views of one Arrow batch inside ``map_batches`` (the
    batch is the vectorization unit — SURVEY.md §1.4). See the module
    docstring for why this deliberately stays a scalar loop.
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    out = np.empty(len(html_col), dtype=object)
    for i, v in enumerate(html_col):
        buf = v.as_buffer() if v.is_valid else None
        out[i] = extract_text(None if buf is None else memoryview(buf))
    return pa.array(out, type=pa.string())
