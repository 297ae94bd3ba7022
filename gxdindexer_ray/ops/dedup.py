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
import pyarrow.compute as pc

from ray.data.aggregate import AggregateFn  # noqa: F401  (documented alternative)

from ..text.tokenize import tokenize_column

_MERSENNE = (1 << 61) - 1

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 lacks np.bitwise_count)."""
    return _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def _hash64_strings(strings: list[str]) -> np.ndarray:
    out = np.empty(len(strings), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(b2b(s.encode(), digest_size=8).digest(), "big")
    return out


def _token_hashes_flat(flat: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """blake2b-64 per token with the Python hashing loop run only over
    UNIQUE tokens (dictionary-encode): identical values to
    ``_hash64_strings(tokens)`` at vocabulary-sized cost."""
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64)
    dic = pc.dictionary_encode(flat)
    uh = _hash64_strings(dic.dictionary.to_pylist())
    idx = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return uh[idx]


_MASK64 = (1 << 64) - 1


def _splitmix64_int(x: int) -> int:
    """Scalar splitmix64 (same constants as relational._splitmix64) —
    the reference path for the vectorized chain."""
    x &= _MASK64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _MASK64
    x ^= x >> 31
    return x


def _chain_int(hashes: list[int]) -> int:
    h = _splitmix64_int(hashes[0])
    for t in hashes[1:]:
        h = _splitmix64_int(h ^ t)
    return h


def _perm_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_set(tokens: list[str], k: int = 3) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return sorted({" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)})


def shingle_hash_set(tokens: list[str], k: int = 3) -> np.ndarray:
    """Sorted unique shingle hashes of one doc (scalar reference path for
    the vectorized ``_shingle_hashes_per_doc``). Shingle hash = splitmix64
    chain over the k consecutive tokens' blake2b-64 hashes; docs shorter
    than k yield ONE whole-doc chain (mirrors ``shingle_set``'s rule).
    Jaccard over these hashes equals Jaccard over shingle strings (modulo
    64-bit collisions), so verified near-dup outputs are hash-invariant."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    th = [int(x) for x in _hash64_strings(tokens)]
    if len(th) < k:
        vals = {_chain_int(th)}
    else:
        vals = {_chain_int(th[i:i + k]) for i in range(len(th) - k + 1)}
    return np.sort(np.fromiter(vals, dtype=np.uint64, count=len(vals)))


_M61 = np.uint64(_MERSENNE)


def _mulmod_m61(a_scalar, h: np.ndarray, b_scalar) -> np.ndarray:
    """(a*h + b) mod 2^61-1, exact, fully vectorized in uint64 via 31/30-bit
    limb splitting (a, b, h all < 2^61; every intermediate < 2^63)."""
    a = int(a_scalar)
    a1 = np.uint64(a >> 31)
    a0 = np.uint64(a & ((1 << 31) - 1))
    h1 = h >> np.uint64(31)
    h0 = h & np.uint64((1 << 31) - 1)
    # a*h = a1*h1*2^62 + (a1*h0 + a0*h1)*2^31 + a0*h0 ; 2^61 = 1 (mod p)
    term1 = (a1 * h1) << np.uint64(1)                     # *2^62 = *2
    mid = a1 * h0 + a0 * h1                               # < 2^62
    mid = (mid >> np.uint64(61)) + (mid & _M61)
    term2 = (mid >> np.uint64(30)) + ((mid & np.uint64((1 << 30) - 1)) << np.uint64(31))
    low = a0 * h0                                         # < 2^62
    low = (low >> np.uint64(61)) + (low & _M61)
    s = term1 + term2 + low + np.uint64(int(b_scalar))    # < 2^63
    s = (s >> np.uint64(61)) + (s & _M61)
    s = (s >> np.uint64(61)) + (s & _M61)
    return np.where(s >= _M61, s - _M61, s)


def _chain_vec(tok_hash: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    from .relational import _splitmix64

    h = _splitmix64(tok_hash[starts])
    for j in range(1, length):
        h = _splitmix64(h ^ tok_hash[starts + j])
    return h


def _shingle_hashes_per_doc(tok_hash: np.ndarray, doc_idx: np.ndarray,
                            n_docs: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(sh_doc, sh_hash): per-doc UNIQUE shingle hashes, sorted by
    (doc, hash), vectorized over the whole flat token stream (no Python
    loop over docs/shingles). Same hash definition as
    ``shingle_hash_set``."""
    n = tok_hash.size
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    bounds = np.searchsorted(doc_idx, np.arange(n_docs + 1))
    lens = np.diff(bounds)
    parts_d: list[np.ndarray] = []
    parts_h: list[np.ndarray] = []
    if n >= k:
        valid = doc_idx[:n - k + 1] == doc_idx[k - 1:]
        starts = np.flatnonzero(valid)
        if starts.size:
            parts_d.append(doc_idx[starts])
            parts_h.append(_chain_vec(tok_hash, starts, k))
    for ell in range(1, k):
        docs = np.flatnonzero(lens == ell)
        if docs.size:
            parts_d.append(docs.astype(np.int64))
            parts_h.append(_chain_vec(tok_hash, bounds[docs], ell))
    if not parts_d:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    d = np.concatenate(parts_d)
    h = np.concatenate(parts_h)
    order = np.lexsort((h, d))
    d = d[order]
    h = h[order]
    keep = np.empty(d.size, dtype=bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return d[keep], h[keep]


def _sig_matrix(sh_doc: np.ndarray, sh_hash: np.ndarray, n_docs: int,
                a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_docs, n_perm) signature matrix from per-doc shingle hashes —
    one exact uint64 mulmod + reduceat per permutation, zero Python-object
    arithmetic."""
    n_perm = a.size
    sig = np.full((n_docs, n_perm), _M61, dtype=np.uint64)
    if sh_doc.size == 0:
        return sig
    hmod = sh_hash % _M61
    run_starts = np.flatnonzero(np.r_[True, sh_doc[1:] != sh_doc[:-1]])
    docs_present = sh_doc[run_starts]
    for i in range(n_perm):
        vals = _mulmod_m61(a[i], hmod, b[i])
        sig[docs_present, i] = np.minimum.reduceat(vals, run_starts)
    return sig


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray,
                      k: int = 3) -> np.ndarray:
    """n_perm minima of (a*h + b) mod 2^61-1 over one doc's shingle-hash
    set (scalar Python-int reference path; the batch path below vectorizes
    across a whole batch and must agree exactly)."""
    sh = shingle_hash_set(tokens, k)
    if sh.size == 0:
        return np.full(a.size, np.uint64(_MERSENNE), dtype=np.uint64)
    h = [int(x) % _MERSENNE for x in sh]
    sig = np.empty(a.size, dtype=np.uint64)
    for i in range(a.size):
        sig[i] = np.uint64(min((int(a[i]) * x + int(b[i])) % _MERSENNE for x in h))
    return sig


def minhash_signature_batch(token_lists: list[list[str]], a: np.ndarray, b: np.ndarray,
                            k: int = 3) -> np.ndarray:
    """(n_docs, n_perm) uint64 signature matrix, vectorized across all
    shingles of a batch at once."""
    n_docs = len(token_lists)
    flat: list[str] = []
    doc_of: list[int] = []
    for d, toks in enumerate(token_lists):
        flat.extend(toks)
        doc_of.extend([d] * len(toks))
    if not flat:
        return np.full((n_docs, a.size), np.uint64(_MERSENNE), dtype=np.uint64)
    tok_hash = _token_hashes_flat(pa.array(flat, pa.string()))
    sh_doc, sh_hash = _shingle_hashes_per_doc(
        tok_hash, np.asarray(doc_of, dtype=np.int64), n_docs, k)
    return _sig_matrix(sh_doc, sh_hash, n_docs, a, b)


def minhash_signatures(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       n_perm: int = 64, shingle_k: int = 3, seed: int = 7):
    """Per-doc MinHash signatures as a Dataset of (id, sig fixed_size_list
    <int64>[n_perm]) — the measurable signature stage of
    ``minhash_lsh_candidates`` exposed on its own, for throughput
    benchmarking and for LSH variants that persist signatures at rest.
    Same kernels, byte-identical minima (uint64 stored as int64 view)."""
    a_p, b_p = _perm_params(n_perm, seed)
    import ray

    ref = ray.put((a_p, b_p))

    def sigs(batch: pa.Table) -> pa.Table:
        ap, bp = ray.get(ref)
        flat, doc_idx = tokenize_column(batch[text_col])
        tok_hash = _token_hashes_flat(flat)
        sh_doc, sh_hash = _shingle_hashes_per_doc(tok_hash, doc_idx,
                                                  batch.num_rows, shingle_k)
        sig = _sig_matrix(sh_doc, sh_hash, batch.num_rows, ap, bp)
        vals = pa.array(sig.reshape(-1).view(np.int64), pa.int64())
        return pa.table({
            id_col: batch[id_col],
            "sig": pa.FixedSizeListArray.from_arrays(vals, n_perm),
        })

    return ds.map_batches(sigs, batch_format="pyarrow")


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
        from .relational import _splitmix64

        ap, bp = ray.get(ref)
        flat, doc_idx = tokenize_column(batch[text_col])
        tok_hash = _token_hashes_flat(flat)
        sh_doc, sh_hash = _shingle_hashes_per_doc(tok_hash, doc_idx,
                                                  batch.num_rows, shingle_k)
        sig = _sig_matrix(sh_doc, sh_hash, batch.num_rows, ap, bp)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        band_hashes = np.empty(bands * n, dtype=np.uint64)
        for bi in range(bands):
            # vectorized band fingerprint: splitmix64 chain over the band's
            # minima, salted by the band id (deterministic, process-stable)
            h = _splitmix64(np.full(n, np.uint64(bi + 1)))
            for c in range(rows_per_band):
                h = _splitmix64(h ^ sig[:, bi * rows_per_band + c])
            band_hashes[bi * n:(bi + 1) * n] = h
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "bhash": pa.array((band_hashes >> np.uint64(1)).astype(np.int64), pa.int64()),
            "doc": pa.array(doc_ids, pa.int64()),
        })

    sig_ds = ds.map_batches(sigs, batch_format="pyarrow")
    return band_bucket_pairs(sig_ds)


def band_bucket_pairs(sig_ds, n_buckets: int = 64):
    """Shared LSH candidate generation: (band, bhash, doc) signature rows
    -> deduplicated (a, b) candidate pairs (a < b). One bhash-keyed
    exchange; pairs emitted per (band, bucket) group; used by both
    MinHash-LSH (text) and hyperplane-LSH (embeddings)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in group.groupby(["band", "bhash"], sort=False):
            docs = sorted(grp["doc"].unique())
            if len(docs) > 1:
                for x, y in itertools.combinations(docs, 2):
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame({"a": out_a, "b": out_b}).astype(np.int64)

    from .relational import dedup_first, mod_exchange_apply

    cand = mod_exchange_apply(sig_ds, "bhash", pairs, n_buckets)
    return dedup_first(cand, ["a", "b"], ["a", "b"])


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa, sb = set(shingle_set(tokens_a, k)), set(shingle_set(tokens_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _empty_verified() -> pd.DataFrame:
    return pd.DataFrame(columns=["a", "b", "jaccard"]).astype(
        {"a": np.int64, "b": np.int64, "jaccard": np.float64})


def _shingle_hash_rows(ds, ids: list[int], id_col: str, text_col: str, k: int,
                       out_id: str, out_sh: str):
    """(doc_id, sorted unique shingle hashes) for the candidate id set —
    hashes (blake2b-64) travel instead of shingle strings; a 64-bit
    collision would need ~2^32 distinct shingles per pair to matter."""
    import pyarrow.compute as pc

    id_arr = pa.array(sorted(ids), pa.int64())

    def grab(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col], value_set=id_arr)
        sub = batch.filter(m)
        flat, doc_idx = tokenize_column(sub[text_col])
        tok_hash = _token_hashes_flat(flat)
        sh_doc, sh_hash = _shingle_hashes_per_doc(tok_hash, doc_idx,
                                                  sub.num_rows, k)
        # per-doc list array straight from the (doc-sorted) flat hashes
        counts = np.bincount(sh_doc, minlength=sub.num_rows) if sh_doc.size else \
            np.zeros(sub.num_rows, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        values = pa.array(sh_hash.view(np.int64), pa.int64())
        return pa.table({
            out_id: sub[id_col],
            out_sh: pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values),
        })

    return ds.map_batches(grab, batch_format="pyarrow")


def verify_pairs_jaccard(ds, pairs, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3,
                         threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard on candidate pairs, DISTRIBUTED: shingle-hash
    sets for the candidate docs are partitioned-joined onto the pair set
    (two key-hash shuffles of candidate-sized data); the per-bucket reducer
    intersects sorted hash arrays and only (a, b, jaccard) rows survive.
    Nothing document-sized ever reaches the driver; only the candidate ID
    SET is broadcast for the docs-side filter (8 bytes per candidate —
    beyond ~1e8 candidates, swap the filter for a hash semi-join)."""
    import ray.data as rd
    from .relational import partitioned_join

    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return _empty_verified()
        pairs_ds = rd.from_pandas(pairs[["a", "b"]].astype(np.int64))
        ids = set(pairs["a"]) | set(pairs["b"])
    else:
        pairs = pairs.materialize()  # consumed twice: id set + join input
        pair_ids = pairs.select_columns(["a", "b"]).take_all()
        if not pair_ids:  # candidate ids only — not documents
            return _empty_verified()
        ids = {int(r["a"]) for r in pair_ids} | {int(r["b"]) for r in pair_ids}
        pairs_ds = pairs

    # shingle-hash rows computed ONCE (tokenize+hash is the expensive
    # part); the b-side is a zero-copy column rename of the same rows
    sh_a = _shingle_hash_rows(ds, ids, id_col, text_col, k, "a_key", "sh_a").materialize()
    j1 = partitioned_join(pairs_ds, sh_a, "a", "a_key", how="inner")
    sh_b = sh_a.map_batches(lambda t: t.rename_columns(["b_key", "sh_b"]),
                            batch_format="pyarrow")

    def jac_post(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_verified()
        jac = np.empty(len(df), np.float64)
        for i, (sa, sb) in enumerate(zip(df["sh_a"].to_numpy(), df["sh_b"].to_numpy())):
            sa = np.asarray(sa)
            sb = np.asarray(sb)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac[i] = (inter / union) if union else 1.0
        out = pd.DataFrame({"a": df["a"].to_numpy(np.int64),
                            "b": df["b"].to_numpy(np.int64),
                            "jaccard": np.round(jac, 6)})
        return out[out["jaccard"] >= threshold]

    j2 = partitioned_join(j1, sh_b, "b", "b_key", how="inner", bucket_post=jac_post)
    out = j2.to_pandas()
    if out.empty:
        return _empty_verified()
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype(
        {"a": np.int64, "b": np.int64, "jaccard": np.float64})


def connected_components(edges, *, max_iters: int = 50):
    """Distributed min-label connected components over an (a, b) pair
    Dataset/DataFrame: iterative label propagation — each round joins
    current labels onto the edge list (one key-hash shuffle) and takes the
    per-node min (one groupby). Rounds needed = component diameter, which
    for near-dup clusters is tiny. Convergence is detected by the strictly
    decreasing global label sum (no extra join). Returns a pandas
    (node, comp) frame; comp is the component's min node id.

    Partitioning assumption: labels/edges shuffle by node hash each round —
    at web scale, pin both to one persistent bucketing (the relational
    partitioned_join pattern) to avoid re-exchange per round."""
    import ray.data as rd
    from ray.data.aggregate import Min
    from .relational import partitioned_join

    if isinstance(edges, pd.DataFrame):
        if edges.empty:
            return pd.DataFrame(columns=["node", "comp"]).astype(np.int64)
        edges = rd.from_pandas(edges[["a", "b"]].astype(np.int64))

    def undirected(batch: pd.DataFrame) -> pa.Table:
        a = batch["a"].to_numpy(np.int64)
        b = batch["b"].to_numpy(np.int64)
        return pa.table({"u": pa.array(np.concatenate([a, b]), pa.int64()),
                         "v": pa.array(np.concatenate([b, a]), pa.int64())})

    # arrow blocks end-to-end: a dataset mixing pandas and arrow blocks
    # trips Ray Data's block-type inference in the groupby sort
    e = edges.map_batches(undirected, batch_format="pandas")
    # init + first propagation in one groupby: comp(u) = min(u, min nbr)
    labels = e.map_batches(
        lambda t: pa.table({"node": t["u"],
                            "comp": pc.min_element_wise(t["u"], t["v"])}),
        batch_format="pyarrow",
    ).groupby("node").aggregate(Min("comp", alias_name="comp"))
    prev_sum = None
    for _ in range(max_iters):
        cur_sum = labels.sum("comp")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

        def relabel(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["v"], "comp": df["comp"]})

        cand = partitioned_join(e, labels, "u", "node", how="inner",
                                bucket_post=relabel)
        labels = labels.union(cand).groupby("node").aggregate(Min("comp", alias_name="comp"))
    out = labels.to_pandas()
    return out.astype({"node": np.int64, "comp": np.int64}).sort_values("node").reset_index(drop=True)


def dedup_corpus(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5, n_perm: int = 64, bands: int = 16,
                 shingle_k: int = 3):
    """Near-dup dedup end-to-end: MinHash-LSH candidates -> distributed
    exact-Jaccard verification -> connected components -> keep the MIN
    doc_id per cluster (first-wins parity with the reference's
    first-write-wins dedup, GxdResultIndexer.java:718-756). Returns the
    kept-id Dataset (id column only). Only the LOSER id set (dup docs
    minus one per cluster) is broadcast for the final filter."""
    import pyarrow.compute as pc
    import ray

    cand = minhash_lsh_candidates(ds, id_col=id_col, text_col=text_col,
                                  n_perm=n_perm, bands=bands, shingle_k=shingle_k)
    verified = verify_pairs_jaccard(ds, cand, id_col=id_col, text_col=text_col,
                                    k=shingle_k, threshold=threshold)
    comp = connected_components(verified)
    losers = comp.loc[comp["node"] != comp["comp"], "node"].to_numpy(np.int64)
    loser_ref = ray.put(pa.array(np.sort(losers), pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(loser_ref)
        m = pc.invert(pc.is_in(batch[id_col], value_set=drop)) if len(drop) \
            else pa.array([True] * batch.num_rows)
        return batch.filter(m).select([id_col])

    return ds.map_batches(keep, batch_format="pyarrow")


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
    """Batch SimHash, fully vectorized (output-identical to simhash_64 per
    row): dictionary-encoded token hashes, per-(doc, token) tf via a
    composite-key sort, one reduceat over the +/-1 bit matrix per doc."""

    def f(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        flat, doc_idx = tokenize_column(batch[text_col])
        out = np.zeros(n_docs, dtype=np.int64)
        if len(flat):
            dic = pc.dictionary_encode(flat.combine_chunks()
                                       if isinstance(flat, pa.ChunkedArray) else flat)
            uh = _hash64_strings(dic.dictionary.to_pylist())
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            # tf per (doc, token): sort by composite key, count runs
            key = doc_idx * len(uh) + codes
            order = np.argsort(key, kind="stable")
            sk = key[order]
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            tf = np.diff(np.r_[starts, sk.size]).astype(np.int64)
            pair_doc = (sk[starts] // len(uh)).astype(np.int64)
            pair_code = (sk[starts] % len(uh)).astype(np.int64)
            bits = ((uh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            signed = bits * 2 - 1                     # (n_uniq, 64)
            contrib = signed[pair_code] * tf[:, None]  # (n_pairs, 64)
            doc_starts = np.flatnonzero(np.r_[True, pair_doc[1:] != pair_doc[:-1]])
            v = np.add.reduceat(contrib, doc_starts, axis=0)
            docs_present = pair_doc[doc_starts]
            # 63 bits so the value stays a positive int64 (matches simhash_64)
            pos = (v[:, :63] > 0).astype(np.int64)
            vals = (pos << np.arange(63, dtype=np.int64)).sum(axis=1)
            out[docs_present] = vals
        return pa.table({id_col: batch[id_col], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def simhash_near_dup(ds, *, max_hamming: int = 3, bands: int = 4,
                     id_col: str = "doc_id", text_col: str = "text") -> pd.DataFrame:
    """SimHash near-dup pairs: Hamming-bucket candidate search + exact
    popcount verification. Standard pigeonhole blocking: split the 64-bit
    fingerprint into ``bands`` contiguous chunks — any pair within
    ``bands - 1`` differing bits shares at least one identical chunk, so
    recall is EXACT for ``max_hamming < bands``; for larger radii it is
    the usual SimHash approximation. Only (band, chunk, id, simhash) rows
    shuffle — never documents; per-bucket verification is vectorized
    XOR + popcount over the (tiny) colliding groups."""
    assert 64 % bands == 0
    width = 64 // bands
    sh = simhash(ds, id_col=id_col, text_col=text_col)

    def explode(batch: pa.Table) -> pa.Table:
        vals = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        chunks = np.empty(bands * n, np.int64)
        for b in range(bands):
            chunks[b * n:(b + 1) * n] = ((vals >> np.uint64(b * width))
                                         & np.uint64((1 << width) - 1)).astype(np.int64)
        return pa.table({
            "band": pa.array(band_ids, pa.int32()),
            "chunk": pa.array(chunks, pa.int64()),
            "doc": pa.array(np.tile(ids, bands), pa.int64()),
            "sh": pa.array(np.tile(vals.astype(np.int64), bands), pa.int64()),
        })

    rows = sh.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for (_, _), grp in group.groupby(["band", "chunk"], sort=False):
            if len(grp) < 2:
                continue
            g = grp.drop_duplicates("doc").sort_values("doc")
            ids = g["doc"].to_numpy(np.int64)
            vals = g["sh"].to_numpy(np.int64).view(np.uint64)
            for i in range(len(ids) - 1):
                ham = _popcount64(vals[i] ^ vals[i + 1:])
                hit = np.flatnonzero(ham <= max_hamming)
                out_a.extend([int(ids[i])] * hit.size)
                out_b.extend(ids[i + 1:][hit].tolist())
                out_h.extend(ham[hit].astype(np.int64).tolist())
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h}).astype(np.int64)

    from .relational import mod_exchange_apply
    from ray.data.aggregate import Min

    cand = mod_exchange_apply(rows, "chunk", pairs, 64)
    out = cand.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming")).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["a", "b", "hamming"]).astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype(np.int64)
