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
    toks = flat.to_pylist()
    # doc_idx is nondecreasing (tokens are emitted row by row) -> slice runs
    bounds = np.searchsorted(doc_idx, np.arange(batch.num_rows + 1))
    return [toks[bounds[i]:bounds[i + 1]] for i in range(batch.num_rows)]


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
        toks = _tokens_by_doc(batch, text_col)
        sig = minhash_signature_batch(toks, ap, bp, k=shingle_k)
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

    cand = mod_exchange_apply(sig_ds, "bhash", pairs, 64)
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
        toks = _tokens_by_doc(sub, text_col)
        shl = [np.unique(_hash64_strings(shingle_set(t, k))).astype(np.int64)
               for t in toks]
        return pa.table({
            out_id: sub[id_col],
            out_sh: pa.array([s.tolist() for s in shl], pa.list_(pa.int64())),
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

    sh_a = _shingle_hash_rows(ds, ids, id_col, text_col, k, "a_key", "sh_a")
    j1 = partitioned_join(pairs_ds, sh_a, "a", "a_key", how="inner")
    sh_b = _shingle_hash_rows(ds, ids, id_col, text_col, k, "b_key", "sh_b")

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
    def f(batch: pa.Table) -> pa.Table:
        toks = _tokens_by_doc(batch, text_col)
        vals = [simhash_64(t) for t in toks]
        return pa.table({id_col: batch[id_col], "simhash": pa.array(vals, pa.int64())})

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
