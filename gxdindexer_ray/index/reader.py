"""Segment reader: the query-time view of a built index.

The segment parquet files ARE the lexicon: reads go through
``pyarrow.dataset`` with a ``term isin(...)`` filter, so parquet row-group
statistics prune to the row groups containing the query terms and only the
needed columns are decoded (rows are sorted by term within each bucket
file; row_group_size=4096 keeps the pruned unit small). Global df of a
sharded hot term = sum of its shard rows' posting counts.

Query actors hold one ``IndexReader`` each (opened once in ``__init__`` —
the stateful-stage pattern, SURVEY.md §2.4).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..state.manifest import read_json

_POSTING_COLUMNS = [
    "term", "shard", "df", "cf", "n_postings", "min_doc", "max_doc",
    "docs_payload", "tfs_payload", "dls_payload",
    "skip_last_doc", "skip_doc_off", "skip_tf_off", "skip_dl_off", "block_max",
]


class IndexReader:
    def __init__(self, index_dir: str | Path):
        self.index_dir = Path(index_dir)
        stats = read_json(self.index_dir / "stats.json")
        if not stats:
            raise FileNotFoundError(f"no stats.json under {index_dir}")
        self.N = int(stats["N"])
        self.avgdl = float(stats["avgdl"])
        self.k1 = float(stats["k1"])
        self.b = float(stats["b"])
        self.block_size = int(stats["block_size"])
        self._ds = pads.dataset(str(self.index_dir / "segments"), format="parquet")

    def fetch_terms(self, terms: list[str]) -> dict[str, list[dict]]:
        """term -> its segment rows (all shards), decoded to python dicts."""
        if not terms:
            return {}
        tbl = self._ds.to_table(
            filter=pc.field("term").isin(terms), columns=_POSTING_COLUMNS
        )
        out: dict[str, list[dict]] = {}
        for row in tbl.to_pylist():
            out.setdefault(row["term"], []).append(row)
        return out

    def term_stats(self, terms: list[str] | None = None) -> dict[str, tuple[int, int]]:
        """term -> (global df, global cf); metadata-only columns."""
        filt = pc.field("term").isin(terms) if terms else None
        tbl = self._ds.to_table(filter=filt, columns=["term", "df", "cf"])
        out: dict[str, tuple[int, int]] = {}
        for t, df, cf in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist(), tbl["cf"].to_pylist()):
            d, c = out.get(t, (0, 0))
            out[t] = (d + df, c + cf)
        return out
