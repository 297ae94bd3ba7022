"""BM25 scoring math, shared by the Ray engine, the WAND scorer, the brute
scorer, and the single-process oracle so scores agree bit-for-bit.

score(q, d) = sum over distinct q terms t of
    idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene variant; always > 0)

Duplicate query terms count once (set semantics), matching common engine
behavior and keeping SQL oracles simple. Ties broken by doc_id ascending.
"""

from __future__ import annotations

import math


def idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_params(k1: float, b: float, avgdl: float) -> dict:
    return {"k1": k1, "b": b, "avgdl": avgdl}


def tf_factor(tf: float, dl: float, k1: float, b: float, avgdl: float) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
