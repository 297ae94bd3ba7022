"""Near-duplicate detection operators: MinHash+LSH, SimHash, n-gram Jaccard.

Pipeline shape (the scalable pattern): per-batch signatures (vectorized)
-> explode to (band_id, band_hash, doc_id) rows -> groupby band bucket ->
candidate pairs within band -> exact verification on the pair set. Only
signatures and candidate pairs ever shuffle — never documents.

All hashes are blake2b-derived (deterministic across processes; Python's
builtin ``hash`` is salted and must never feed a shuffle key)."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import AggregateFn  # noqa: F401  (documented alternative)

from ..text.tokenize import tokenize_column

_MERSENNE = (1 << 61) - 1


def _hash64_strings(strings: list[str]) -> np.ndarray:
    out = np.empty(len(strings), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(b2b(s.encode(), digest_size=8).digest(), "big")
    return out


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_set(tokens: list[str], k: int = 3) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return sorted({" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)})


def minhash_signature(shingles: list[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm minima of (a*h + b) mod 2^61-1 over one shingle set (scalar
    reference path; the batch path below vectorizes across a whole batch)."""
    if not shingles:
        return np.full(a.size, np.uint64(_MERSENNE), dtype=np.uint64)
    h = (_hash64_strings(shingles) % np.uint64(_MERSENNE)).astype(object)
    sig = np.empty(a.size, dtype=np.uint64)
    for i in range(a.size):
        vals = (int(a[i]) * h + int(b[i])) % _MERSENNE
        sig[i] = np.uint64(min(vals))
    return sig


def minhash_signature_batch(token_lists: list[list[str]], a: np.ndarray, b: np.ndarray,
                            k: int = 3) -> np.ndarray:
    """(n_docs, n_perm) uint64 signature matrix, vectorized across all
    shingles of a batch at once."""
    n_docs = len(token_lists)
    n_perm = a.size
    sig = np.full((n_docs, n_perm), np.uint64(_MERSENNE), dtype=np.uint64)
    all_shingles: list[str] = []
    doc_of: list[int] = []
    for d, toks in enumerate(token_lists):
        sh = shingle_set(toks, k)
        all_shingles.extend(sh)
        doc_of.extend([d] * len(sh))
    if not all_shingles:
        return sig
    h = (_hash64_strings(all_shingles) % np.uint64(_MERSENNE)).astype(object)
    doc_of_arr = np.asarray(doc_of, dtype=np.int64)
    for i in range(n_perm):
        vals = ((int(a[i]) * h + int(b[i])) % _MERSENNE).astype(np.uint64)
        np.minimum.at(sig[:, i], doc_of_arr, vals)
    return sig


def _tokens_by_doc(batch: pa.Table, text_col: str) -> list[list[str]]:
    flat, doc_idx = tokenize_column(batch[text_col])
    out: list[list[str]] = [[] for _ in range(batch.num_rows)]
    for tok, d in zip(flat.to_pylist(), doc_idx):
        out[int(d)].append(tok)
    return out


def minhash_lsh_candidates(ds, *, id_col: str = "doc_id", text_col: str = "text",
                           n_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                           seed: int = 7):
    """Candidate near-dup pairs via banded MinHash-LSH. Returns a Dataset of
    (a, b) candidate pairs (a < b), deduplicated."""
    assert n_perm % bands == 0
    rows_per_band = n_perm // bands
    a_p, b_p = _perm_params(n_perm, seed)
    import ray

    ref = ray.put((a_p, b_p))

    def sigs(batch: pa.Table) -> pa.Table:
        ap, bp = ray.get(ref)
        toks = _tokens_by_doc(batch, text_col)
        sig = minhash_signature_batch(toks, ap, bp, k=shingle_k)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        band_ids, band_hashes, doc_ids = [], [], []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            for r in range(len(ids)):
                bh = hashlib.blake2b(chunk[r].tobytes(), digest_size=8).digest()
                band_ids.append(bi)
                band_hashes.append(int.from_bytes(bh, "big") & ((1 << 63) - 1))
                doc_ids.append(int(ids[r]))
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "bhash": pa.array(band_hashes, pa.int64()),
            "doc": pa.array(doc_ids, pa.int64()),
        })

    sig_ds = ds.map_batches(sigs, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in group.groupby(["band", "bhash"], sort=False):
            docs = sorted(grp["doc"].unique())
            if len(docs) > 1:
                for x, y in itertools.combinations(docs, 2):
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame({"a": out_a, "b": out_b}).astype(np.int64)

    from .relational import add_mod_bucket, bucketed_apply, dedup_first

    bucketed = add_mod_bucket(sig_ds, "bhash", 64)
    cand = bucketed_apply(bucketed, "__bucket", pairs)
    return dedup_first(cand, ["a", "b"], ["a", "b"])


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa, sb = set(shingle_set(tokens_a, k)), set(shingle_set(tokens_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(ds, pairs: pd.DataFrame, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard on candidate pairs. Texts for the (small)
    candidate id set are collected and broadcast; verification is driver-side
    because the pair set is the output of LSH pruning (provably small)."""
    if pairs.empty:
        return pd.DataFrame(columns=["a", "b", "jaccard"]).astype(
            {"a": np.int64, "b": np.int64, "jaccard": np.float64})
    import pyarrow.compute as pc

    ids = sorted(set(pairs["a"]) | set(pairs["b"]))

    def grab(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col], value_set=pa.array(ids, pa.int64()))
        return batch.filter(m).select([id_col, text_col])

    texts_tbl = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    from ..text.tokenize import tokenize

    toks = {int(r[id_col]): tokenize(r[text_col] or "") for _, r in texts_tbl.iterrows()}
    rows = []
    for _, r in pairs.iterrows():
        j = exact_jaccard(toks.get(int(r["a"]), []), toks.get(int(r["b"]), []), k)
        if j >= threshold:
            rows.append((int(r["a"]), int(r["b"]), round(j, 6)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).astype(
        {"a": np.int64, "b": np.int64, "jaccard": np.float64})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_64(tokens: list[str]) -> int:
    """Charikar SimHash over unigram token hashes weighted by tf."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.array(tokens, dtype=object), return_counts=True)
    h = _hash64_strings([str(u) for u in uniq])
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = 0
    for i in range(63):  # 63 bits so the value stays a positive int64
        if v[i] > 0:
            out |= 1 << i
    return out


def simhash(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    def f(batch: pa.Table) -> pa.Table:
        toks = _tokens_by_doc(batch, text_col)
        vals = [simhash_64(t) for t in toks]
        return pa.table({id_col: batch[id_col], "simhash": pa.array(vals, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")
