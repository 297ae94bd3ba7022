"""DAG / graph operators: transitive closure over an edge Dataset.

The reference ships precomputed edge + closure tables and walks them
(GxdDagEdgeIndexer.java:63-73 direct edges, :123-133 descendant closure;
SharedQueries.java:59-62 ancestor closure). Here the closure is COMPUTED:
semi-naive iteration — each round joins the frontier's dst against the base
edges' src (a distributed hash-partitioned join), keeps only never-seen
pairs, and stops at fixpoint. Rounds = graph depth, not size.

Scale note: the seen-set/dedup lives on the driver because ontology-sized
closures are dimension-table-sized (the reference broadcasts them into doc
build, SURVEY.md T7/T8). For web-graph-scale closures, replace the driver
set with a distributed anti-join per round (same `partitioned_join`
machinery, bucket by pair hash)."""

from __future__ import annotations

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
