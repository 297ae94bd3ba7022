"""Reusable Ray-Data-first relational operators — the reference's operator
inventory (SURVEY.md §2) re-expressed as composable Dataset transforms.

Design rules applied throughout:
- columns pruned at the read (``read_table(columns=...)``);
- aggregation is partial/final: per-batch pandas partials, then a small
  ``groupby().aggregate`` over one row per key per batch (A6);
- small join sides are broadcast once via ``ray.put`` and looked up inside
  ``map_batches`` (J1 — the reference's in-heap cache joins,
  GxdResultIndexer.java:91-272); no shuffle;
- per-key exact ops with millions of tiny groups (dedup-first, window
  funcs) go through explicit hash buckets: ``groupby(bucket)`` with a
  vectorized pandas body per bucket, never one Python call per key;
- global top-k is per-batch partial top-k + tiny driver-side final merge,
  never a full sort.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def read_table(sf_dir: str | Path, name: str, columns: list[str] | None = None, filter=None):
    return rd.read_parquet(str(Path(sf_dir) / f"{name}.parquet"), columns=columns, filter=filter)


# ---------------------------------------------------------------------------
# broadcast joins / semi / anti (J1, J3, J4, J5)
# ---------------------------------------------------------------------------

class _BroadcastJoiner:
    """Actor: small side fetched from the object store once per worker."""

    def __init__(self, small_ref, on, how):
        self.small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner", concurrency=(1, 8)):
    ref = ray.put(small_df)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how},
        batch_format="pandas",
        concurrency=concurrency,
    )


def key_set(ds, col: str) -> frozenset:
    """Collect the distinct key set of a (small-cardinality) column."""
    vals = ds.unique(col)
    return frozenset(v[col] if isinstance(v, dict) else v for v in vals)


def semi_join_filter(ds, col: str, keys: frozenset, anti: bool = False):
    ref = ray.put(keys)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = batch[col].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# partitioned hash join (J2) — both sides large
# ---------------------------------------------------------------------------

def partitioned_join(left, right, left_on: str, right_on: str, *,
                     n_buckets: int = 32, how: str = "inner", bucket_post=None):
    """Explicit hash-partitioned equi-join on int64 keys: both sides get a
    ``key % n_buckets`` bucket, are unioned under one Arrow schema (missing
    columns as typed nulls), shuffled once by bucket, and joined per bucket
    with a vectorized pandas merge. This is the portable pattern when the
    sides are too large to broadcast; one shuffle total.

    Skew note: a hot join key maps to one bucket — salt it by appending a
    per-row sub-bucket to BOTH sides' keys (replicating the build side) the
    same way hot terms are doc-range-sharded in the index merge.

    ``bucket_post`` (pandas->pandas) runs on each bucket's joined frame
    BEFORE it leaves the reducer. Because a bucket holds every row of its
    join keys, any per-key aggregation done here is already final — reuse
    the join's partitioning instead of paying a second shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # normalize to Arrow blocks: pandas-backed Datasets report numpy dtypes,
    # and the typed-null union below needs real Arrow types
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = list(zip(l_schema.names, l_schema.types))
    r_fields = [(n, t) for n, t in zip(r_schema.names, r_schema.types) if n not in l_schema.names]
    all_fields = l_fields + r_fields
    l_names = [n for n, _ in l_fields]
    r_names = list(r_schema.names)

    def unify(side: int, key_col: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = batch[name].combine_chunks().cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            keys = batch[key_col].to_numpy(zero_copy_only=False)
            if np.issubdtype(keys.dtype, np.integer):
                jb = (keys.astype(np.int64) % n_buckets).astype(np.int32)
            else:  # string/object keys: stable hash (never Python's salted hash)
                jb = (pd.util.hash_pandas_object(pd.Series(keys), index=False).to_numpy()
                      % n_buckets).astype(np.int32)
            cols["__jb"] = pa.array(jb)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return f

    u = left.map_batches(unify(0, left_on), batch_format="pyarrow").union(
        right.map_batches(unify(1, right_on), batch_format="pyarrow")
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        import pyarrow.compute as pc2

        l_tbl = group.filter(pc2.equal(side, 0)).select(l_names)
        r_tbl = group.filter(pc2.equal(side, 1)).select(r_names)
        l_df = l_tbl.to_pandas()
        r_df = r_tbl.to_pandas()
        merged = l_df.merge(r_df, left_on=left_on, right_on=right_on, how=how)
        if bucket_post is not None:
            merged = bucket_post(merged)
        return pa.Table.from_pandas(merged, preserve_index=False)

    return u.groupby("__jb").map_groups(join_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# partial/final aggregation (A1, A6)
# ---------------------------------------------------------------------------

def pre_aggregate(
    ds,
    keys: list[str],
    *,
    sums: dict[str, str] | None = None,    # out_name -> input col
    counts: str | None = None,             # out_name for count(*)
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    driver_final: bool = False,
):
    """Per-batch pandas partials -> final merge. Returns a Dataset (or a
    pandas DataFrame when ``driver_final``).

    ``driver_final=True`` skips the groupby shuffle and finishes the merge
    with one pandas groupby on the collected partials — correct whenever
    the PARTIAL row count (≈ keys x batches) fits the driver, and much
    faster than a distributed sort for medium key cardinalities. Use the
    shuffle path when the key space itself is too big to collect."""
    sums = sums or {}
    mins = mins or {}
    maxs = maxs or {}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True)
        parts = {}
        for out, col in sums.items():
            parts[out] = g[col].sum()
        if counts:
            parts[counts] = g.size()
        for out, col in mins.items():
            parts[out] = g[col].min()
        for out, col in maxs.items():
            parts[out] = g[col].max()
        return pd.DataFrame(parts).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    if driver_final:
        pdf = partials.to_pandas()
        g = pdf.groupby(keys, sort=False, observed=True)
        agg_map = {}
        for out in sums:
            agg_map[out] = (out, "sum")
        if counts:
            agg_map[counts] = (counts, "sum")
        for out in mins:
            agg_map[out] = (out, "min")
        for out in maxs:
            agg_map[out] = (out, "max")
        return g.agg(**agg_map).reset_index()
    aggs = []
    for out in sums:
        aggs.append(Sum(out, alias_name=out))
    if counts:
        aggs.append(Sum(counts, alias_name=counts))
    for out in mins:
        aggs.append(Min(out, alias_name=out))
    for out in maxs:
        aggs.append(Max(out, alias_name=out))
    return partials.groupby(keys).aggregate(*aggs)


# ---------------------------------------------------------------------------
# bucketed per-key ops (D3 dedup-first, O1 ordinals, windows)
# ---------------------------------------------------------------------------

def add_hash_bucket(ds, cols: list[str], n_buckets: int, out: str = "__bucket"):
    """Deterministic key-hash bucket column (pd.util.hash_pandas_object with
    its fixed default hash key — stable across processes)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[cols].astype(str).agg("\x00".join, axis=1), index=False)
        batch[out] = (h % n_buckets).astype(np.int32)
        return batch

    return ds.map_batches(f, batch_format="pandas")


def add_mod_bucket(ds, col: str, n_buckets: int, out: str = "__bucket"):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out] = (batch[col].astype(np.int64) % n_buckets).astype(np.int32)
        return batch

    return ds.map_batches(f, batch_format="pandas")


def bucketed_apply(ds, bucket_col: str, fn):
    """groupby(bucket) -> vectorized pandas fn per bucket (fn sees ALL rows
    of the bucket and must handle multiple keys internally)."""

    def g(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns=[bucket_col]))

    return ds.groupby(bucket_col).map_groups(g, batch_format="pandas")


def dedup_first(ds, key_cols: list[str], order_cols: list[str], n_buckets: int = 64):
    """Exact per-key first-wins dedup (D3): hash-bucket by key, sort+drop
    within bucket. In-batch pre-dedup first to shrink the shuffle."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(order_cols, kind="mergesort").drop_duplicates(key_cols, keep="first")

    ds = ds.map_batches(local, batch_format="pandas")
    ds = add_hash_bucket(ds, key_cols, n_buckets)
    return bucketed_apply(ds, "__bucket", local)


# ---------------------------------------------------------------------------
# distributed top-k (O5)
# ---------------------------------------------------------------------------

def distributed_topk(ds, by: list[str], ascending: list[bool], k: int) -> pd.DataFrame:
    """Per-batch partial top-k, tiny driver-side final merge — no global sort."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(by, ascending=ascending, kind="mergesort").head(k).reset_index(drop=True)
    )
