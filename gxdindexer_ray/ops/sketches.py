"""Mergeable sketches: HyperLogLog approximate distinct count.

The canonical sketch pattern for Ray Data (A7 in SURVEY.md §2.6 — the
reference needs none because the DB computes distincts, but at 1e12 rows an
exact global distinct is an all-to-all): one serialized sketch per batch
from ``map_batches``, merged in a tiny final stage — registers travel, rows
never do.

Plain dense HLL, 2^p registers, blake2b-hashed values (deterministic across
processes — never Python's salted ``hash``). Standard bias-corrected
estimator with linear counting for the low range (Flajolet et al. 2007).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa


class HLL:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """h: uint64 hashes."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)  # sentinel low bits
        # rank = leading zeros of rest + 1, vectorized via bit length
        bl = np.zeros(h.size, dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = r >= (np.uint64(1) << np.uint64(shift))
            bl[m] += shift
            r[m] >>= np.uint64(shift)
        bl[r > 0] += 1
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        b2b = hashlib.blake2b
        h = np.fromiter(
            (int.from_bytes(b2b(str(v).encode(), digest_size=8).digest(), "big") for v in values),
            dtype=np.uint64, count=len(values),
        )
        self.add_hashes(h)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch sketches -> driver merge.
    Only 2^p-byte registers leave each batch."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_strings(batch[col].to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc = acc.merge(HLL.from_bytes(row["sketch"], p))
    return acc.estimate()


def approx_distinct_by_key(ds, key: str, col: str, p: int = 10) -> pd.DataFrame:
    """Approximate per-key distinct counts: per-batch per-key sketches ->
    driver-side register merge (sketches are tiny and mergeable, so the
    'shuffle' is one row of 2^p bytes per key per batch)."""

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in batch.groupby(key, sort=False):
            h = HLL(p)
            h.add_strings(grp[col].tolist())
            rows.append((k, h.to_bytes()))
        return pd.DataFrame(rows, columns=[key, "sketch"])

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    out = []
    for k, grp in parts.groupby(key, sort=True):
        acc = HLL(p)
        for b in grp["sketch"]:
            acc = acc.merge(HLL.from_bytes(b, p))
        out.append((k, acc.estimate()))
    return pd.DataFrame(out, columns=[key, "approx_distinct"])
