"""DAG / graph operators: transitive closure over an edge Dataset.

The reference ships precomputed edge + closure tables and walks them
(GxdDagEdgeIndexer.java:63-73 direct edges, :123-133 descendant closure;
SharedQueries.java:59-62 ancestor closure). Here the closure is COMPUTED:
semi-naive iteration — each round joins the frontier's dst against the base
edges' src (a distributed hash-partitioned join), keeps only never-seen
pairs, and stops at fixpoint. Rounds = graph depth, not size.

Two variants share the semi-naive shape:
- ``transitive_closure`` keeps the seen-set on the driver — right for
  ontology-sized closures (the reference broadcasts them into doc build,
  SURVEY.md T7/T8), and what the q39 catalog entry uses.
- ``transitive_closure_distributed`` keeps EVERYTHING as Datasets: the
  per-round dedup is a groupby-aggregate distinct and the seen-filter is a
  bucketed anti-join through the group-integral hash exchange — the
  web-graph-scale path (nothing graph-sized ever reaches the driver)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .relational import partitioned_join


def transitive_closure(edges_ds, *, src: str = "src", dst: str = "dst",
                       max_iters: int = 32) -> pd.DataFrame:
    """All reachable (src, dst) pairs, src != dst not enforced (follows the
    edge relation as given). Returns a pandas DataFrame (closure is
    dimension-sized; see module docstring)."""
    base = edges_ds.to_pandas().drop_duplicates([src, dst])
    closure = set(map(tuple, base[[src, dst]].to_numpy()))
    frontier = base
    for _ in range(max_iters):
        f_ds = rd.from_pandas(frontier.rename(columns={src: "f_src", dst: "f_mid"}))
        e_ds = rd.from_pandas(base.rename(columns={src: "e_mid", dst: "e_dst"}))
        step = partitioned_join(f_ds, e_ds, "f_mid", "e_mid", how="inner").to_pandas()
        if step.empty:
            break
        pairs = step[["f_src", "e_dst"]].drop_duplicates()
        fresh = [(a, b) for a, b in map(tuple, pairs.to_numpy()) if (a, b) not in closure]
        if not fresh:
            break
        closure.update(fresh)
        frontier = pd.DataFrame(fresh, columns=[src, dst])
    else:
        raise RuntimeError(f"transitive_closure did not converge in {max_iters} iters (cycle?)")
    out = pd.DataFrame(sorted(closure), columns=[src, dst])
    return out


def transitive_closure_distributed(edges_ds, *, src: str = "src", dst: str = "dst",
                                   max_iters: int = 32, n_buckets: int = 32):
    """Web-graph-scale variant: all reachable (src, dst) pairs with the
    closure, frontier, joins, distinct AND the seen-set anti-join all
    distributed. Per round: frontier ⋈ edges (one key-hash shuffle) ->
    distinct (aggregate combiner tree) -> anti-join against the closure
    (bucketed by pair hash through hash_exchange_apply) -> union. The
    driver only sees per-round COUNTS. Returns a Dataset."""
    from ray.data.aggregate import Count

    from .relational import add_hash_bucket, hash_exchange_apply

    def distinct(ds):
        agg = ds.groupby([src, dst]).aggregate(Count(alias_name="__n"))
        return agg.map_batches(lambda t: t.select([src, dst]), batch_format="pyarrow")

    base = distinct(edges_ds).materialize()
    closure = base
    frontier = base
    for _ in range(max_iters):
        f = frontier.map_batches(
            lambda df: df.rename(columns={src: "f_src", dst: "f_mid"}),
            batch_format="pandas")
        e = base.map_batches(
            lambda df: df.rename(columns={src: "e_mid", dst: "e_dst"}),
            batch_format="pandas")
        step = partitioned_join(f, e, "f_mid", "e_mid", how="inner")
        pairs = distinct(step.map_batches(
            lambda df: df[["f_src", "e_dst"]].rename(
                columns={"f_src": src, "e_dst": dst}),
            batch_format="pandas"))
        # bucketed anti-join: pairs minus closure, whole-bucket integrity
        tag = "__is_new"
        tagged = closure.map_batches(
            lambda df: df.assign(**{tag: np.int8(0)}), batch_format="pandas"
        ).union(pairs.map_batches(
            lambda df: df.assign(**{tag: np.int8(1)}), batch_format="pandas"))

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            seen = set(map(tuple, df.loc[df[tag] == 0, [src, dst]].to_numpy()))
            new = df[df[tag] == 1]
            keep = np.fromiter(((a, b) not in seen for a, b in
                                zip(new[src], new[dst])), bool, len(new))
            return new.loc[keep, [src, dst]]

        fresh = hash_exchange_apply(add_hash_bucket(tagged, [src, dst], n_buckets),
                                    "__bucket", anti).materialize()
        if fresh.count() == 0:
            return closure
        closure = distinct(closure.union(fresh)).materialize()
        frontier = fresh
    raise RuntimeError(f"transitive_closure did not converge in {max_iters} iters (cycle?)")
