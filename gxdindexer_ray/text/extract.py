"""Frozen HTML -> text extraction spec (version 1).

The north rule requires *byte-identical extracted text per url* at every
parallelism level, so extraction is a frozen pure function — the analog of
the reference's deterministic per-row field derivations
(reference GxdResultIndexer.java:979-1247). Spec v1:

1. null/empty html -> "".
2. bytes decoded as UTF-8 with errors="replace" (deterministic; no charset
   sniffing — versioned here so it can never drift silently).
3. remove <script>...</script>, <style>...</style> (case-insensitive,
   including attributes, dotall) and <!-- comments -->.
4. every remaining tag ``<...>`` is replaced by a single space.
5. HTML entities unescaped (after tag removal, so ``&lt;`` never becomes a
   tag).
6. whitespace normalized: split on any whitespace run, join with one space.

Regexes are compiled once at import (module-level), which is the
stateless-task analogue of actor-``__init__`` state.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

EXTRACT_SPEC_VERSION = 1

_SCRIPT_RE = re.compile(rb"<script\b[^>]*>.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b[^>]*>.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html_bytes: bytes | None) -> str:
    """Extract visible text from raw html bytes. Pure, deterministic, frozen."""
    if html_bytes is None or len(html_bytes) == 0:
        return ""
    h = _SCRIPT_RE.sub(b" ", html_bytes)
    h = _STYLE_RE.sub(b" ", h)
    h = _COMMENT_RE.sub(b" ", h)
    h = _TAG_RE.sub(b" ", h)
    s = h.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return " ".join(s.split())


def extract_column(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized wrapper for a ``binary`` Arrow column.

    HTML parsing is inherently per-document; the per-row loop here runs over
    zero-copy buffer views of one Arrow batch inside ``map_batches`` (the
    batch is the vectorization unit — SURVEY.md §1.4).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    out = np.empty(len(html_col), dtype=object)
    for i, v in enumerate(html_col):
        buf = v.as_buffer() if v.is_valid else None
        out[i] = extract_text(None if buf is None else memoryview(buf))
    return pa.array(out, type=pa.string())
