"""The flagship pipeline: pages parquet -> inverted index segments.

Phase structure (each phase seals an atomic manifest; a re-run with the same
input fingerprint + config skips completed phases — the checkpoint-resume
the reference lacks, see state/manifest.py):

  P0 docstore : read pages -> HTML extract (html dropped immediately) ->
                docID + doc length -> in-batch pre-dedup -> doc-range-
                bucketed exact url dedup (first-wins by (warc_ts, text)) ->
                docs/ parquet (doc_id-range clustered)
  P1 stats    : columnar scan of dl only -> N, avgdl -> stats.json
  P2 hotterms : deterministic doc_id hash-sample -> sampled df -> hot set
  P3 segments : tokenize + SPIMI partial tasks writing a per-bucket file
                exchange -> one merge task per bucket -> segment files
                + per-bucket lineage rows -> segments_manifest.json

Reference parity: this is GxdResultIndexer.index()'s scan->derive->write
spine (GxdResultIndexer.java:935-1266) with the index build internalized
instead of delegated to Solr. Scale notes are inline per stage.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, IndexConfig
from ..index.docid import doc_id_column
from ..index.merge import merge_bucket_files, MANIFEST_SCHEMA
from ..index.spimi import make_spimi_writer_fn
from ..state.manifest import PhaseManifest, atomic_write_json, config_key, fingerprint_inputs, read_json
from ..text.extract import extract_column
from ..text.tokenize import doc_term_counts  # noqa: F401 (P2 sampling)

DOCSTORE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("text", pa.string()),
        pa.field("dl", pa.int64()),
    ]
)

_DEDUP_RANGE_BITS = 9  # 512 doc-range dedup buckets -> docstore files are
                       # doc_id-range clustered (parquet stats prune lookups)


def _dedup_slim(batch: pa.Table) -> pa.Table:
    """First-wins url dedup over SLIM rows: keep min (warc_ts, text) per
    url. Used both in-batch (pre-dedup) and per doc-range bucket (final)."""
    order = pc.sort_indices(
        batch,
        sort_keys=[("url", "ascending"), ("warc_ts", "ascending"), ("text", "ascending")],
        null_placement="at_start",
    )
    batch = batch.take(order)
    urls = batch["url"].combine_chunks()
    n = len(urls)
    if n <= 1:
        first = pa.array([True] * n)
    else:
        same_as_prev = pc.equal(urls.slice(1, n - 1), urls.slice(0, n - 1))
        first = pa.concat_arrays([pa.array([True]), pc.invert(same_as_prev)])
    return batch.filter(first)


def _extract_prededup(batch: pa.Table) -> pa.Table:
    """Map side of P0: extract text (frozen spec v1) FIRST, drop the wide
    html column, assign docIDs, then in-batch pre-dedup. Only slim rows
    (text, ~1/3 of html bytes) ever cross the dedup exchange — extracting a
    duplicate row wastes a little CPU on <0.2%% of rows and saves shipping
    every row's html through the shuffle."""
    batch = batch.combine_chunks()
    text = extract_column(batch["html"])
    # dl = number of tokenizer matches — one C kernel, no token
    # materialization (the full tokenize happens once, in the SPIMI phase)
    from ..text.tokenize import TOKEN_PATTERN

    dl = pc.count_substring_regex(pc.utf8_lower(text), pattern=TOKEN_PATTERN)
    slim = pa.table(
        {
            "doc_id": doc_id_column(batch["url"]),
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "text": text,
            "dl": dl.cast(pa.int64()),
        },
        schema=DOCSTORE_SCHEMA,
    )
    slim = _dedup_slim(slim)
    rb = (slim["doc_id"].to_numpy(zero_copy_only=False) >> (63 - _DEDUP_RANGE_BITS)).astype(np.int32)
    return slim.append_column("range_bucket", pa.array(rb, pa.int32()))


def _dedup_group(group: pa.Table) -> pa.Table:
    """Reduce side of P0: exact first-wins dedup within a doc-range bucket
    (D3, SURVEY.md §2.8)."""
    return _dedup_slim(group).drop_columns(["range_bucket"])


_REQUIRED_INPUT = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "lang": pa.string(),
}


def _validate_pages_schema(path: str) -> None:
    """Fail fast with a precise message when the input is not the
    BASELINE.json input_hint shape (explicit-schema stance, SURVEY.md §1.3:
    the reference lets Solr type fields server-side; we validate at the
    door instead)."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(path)
    problems = []
    for name, typ in _REQUIRED_INPUT.items():
        if name not in schema.names:
            problems.append(f"missing column {name!r} ({typ})")
        else:
            got = schema.field(name).type
            ok = got == typ or (name == "html" and got in (pa.binary(), pa.large_binary()))
            if not ok:
                problems.append(f"column {name!r} is {got}, expected {typ}")
    if problems:
        raise ValueError(
            f"input corpus schema mismatch in {path}: " + "; ".join(problems)
            + " (expected pages shape: url string, warc_ts timestamp[us], html binary, "
              "text string, lang string)"
        )


def _save_exec_stats(out: Path, tag: str, ds) -> None:
    """Persist Ray Data's per-stage execution stats (wall/cpu/memory
    breakdown) for capacity planning — the analog of the reference's
    per-indexer timing files (bin/buildIndexes:262)."""
    try:
        (out / "_manifests").mkdir(parents=True, exist_ok=True)
        (out / "_manifests" / f"exec-stats-{tag}.txt").write_text(ds.stats())
    except Exception:
        pass  # stats are advisory; never fail a build over them


def build_index(
    pages_dir: str | Path,
    out_dir: str | Path,
    cfg: IndexConfig = DEFAULT_CONFIG,
    *,
    resume: bool = True,
    parallelism: int | None = None,
) -> dict:
    """Build the full index; returns the metrics dict (also metrics.json)."""
    pages_dir, out = Path(pages_dir), Path(out_dir)
    input_files = sorted(str(p) for p in pages_dir.glob("*.parquet"))
    if not input_files:
        raise FileNotFoundError(f"no parquet files in {pages_dir}")
    _validate_pages_schema(input_files[0])
    from ..text.extract import EXTRACT_SPEC_VERSION

    # frozen-spec versions are part of the checkpoint key: a spec bump must
    # invalidate resume state even though it isn't an IndexConfig field
    key = f"{fingerprint_inputs(input_files)}-{config_key(cfg)}-x{EXTRACT_SPEC_VERSION}"
    out.mkdir(parents=True, exist_ok=True)
    docs_dir = out / "docs"
    segments_dir = out / "segments"
    metrics: dict = {"phases": {}}

    # ---------------- P0: docstore ------------------------------------
    p0 = PhaseManifest(out, "docstore", key)
    t0 = time.perf_counter()
    if not (resume and p0.is_complete()):
        ds = rd.read_parquet(input_files, columns=["url", "warc_ts", "html", "lang"])
        ds = ds.map_batches(_extract_prededup, batch_format="pyarrow", batch_size=cfg.batch_size)
        # Scale note: only slim (text) rows cross this exchange; on
        # re-crawls whose storage is already url-range-partitioned, the
        # dedup stays entirely map-side.
        ds = ds.groupby("range_bucket").map_groups(_dedup_group, batch_format="pyarrow")
        import shutil

        tmp_docs = out / ".docs.tmp"
        if tmp_docs.exists():
            shutil.rmtree(tmp_docs)
        if docs_dir.exists():
            shutil.rmtree(docs_dir)
        # lz4: the docstore is a per-build intermediate read back twice
        # (stats/sample + SPIMI); cheap codec beats ratio here
        ds.write_parquet(str(tmp_docs), compression="lz4", min_rows_per_file=cfg.min_rows_per_file)
        tmp_docs.rename(docs_dir)
        _save_exec_stats(out, "p0-docstore", ds)
        p0.seal(files=len(list(docs_dir.glob("*.parquet"))))
    metrics["phases"]["docstore"] = round(time.perf_counter() - t0, 3)

    doc_files = sorted(str(p) for p in docs_dir.glob("*.parquet"))

    # ---------------- P1: corpus stats --------------------------------
    p1 = PhaseManifest(out, "stats", key)
    t0 = time.perf_counter()
    stats_path = out / "stats.json"
    if not (resume and p1.is_complete()):
        dls = rd.read_parquet(doc_files, columns=["dl"])
        N = int(dls.count())
        total_dl = int(dls.sum("dl") or 0)
        stats = {
            "N": N,
            "total_dl": total_dl,
            "avgdl": (total_dl / N) if N else 0.0,
            "k1": cfg.k1,
            "b": cfg.b,
            "block_size": cfg.block_size,
        }
        atomic_write_json(stats_path, stats)
        p1.seal(**stats)
    stats = read_json(stats_path)
    metrics["phases"]["stats"] = round(time.perf_counter() - t0, 3)

    # ---------------- P2: hot-term detection --------------------------
    # Deterministic hash-sample: doc_id < cut. Partition-invariant, so the
    # hot set (and therefore segment bytes) never depends on parallelism.
    p2 = PhaseManifest(out, "hotterms", key)
    t0 = time.perf_counter()
    hot_path = out / "hot_terms.json"
    if not (resume and p2.is_complete()):
        N = max(1, stats["N"])
        frac = min(1.0, cfg.hot_sample_target / N)
        cut = min(int((1 << 63) * frac), (1 << 63) - 1)
        sample = rd.read_parquet(doc_files, columns=["doc_id", "text"],
                                 filter=pc.field("doc_id") < cut)

        def _sample_df(batch: pa.Table) -> pa.Table:
            # df per term = count of distinct (doc, term) pairs in the batch
            vocab, _, codes, _ = doc_term_counts(batch["text"])
            df = np.bincount(codes, minlength=len(vocab)).astype(np.int64) if codes.size else np.empty(0, np.int64)
            tbl = pa.table({"term": vocab, "df": pa.array(df, pa.int64())})
            meta = pa.table({"term": pa.array(["\x00__sampled_docs__"]),
                             "df": pa.array([batch.num_rows], pa.int64())})
            return pa.concat_tables([tbl, meta])

        sdf = sample.map_batches(_sample_df, batch_format="pyarrow", batch_size=1024)
        from collections import Counter

        counts: Counter = Counter()
        sampled_docs = 0
        for b in sdf.iter_batches(batch_format="pyarrow"):
            for term, df in zip(b["term"].to_pylist(), b["df"].to_pylist()):
                if term == "\x00__sampled_docs__":
                    sampled_docs += df
                else:
                    counts[term] += df
        hot = sorted(t for t, c in counts.items() if sampled_docs and c / sampled_docs > cfg.hot_df_ratio)
        atomic_write_json(hot_path, {"hot_terms": hot, "sampled_docs": sampled_docs})
        p2.seal(n_hot=len(hot), sampled_docs=sampled_docs)
    hot_terms = read_json(hot_path)["hot_terms"]
    metrics["phases"]["hotterms"] = round(time.perf_counter() - t0, 3)

    # ---------------- P3: SPIMI partials -> shuffle -> merged segments -
    p3 = PhaseManifest(out, "segments", key)
    t0 = time.perf_counter()
    seg_manifest_path = out / "segments_manifest.json"
    if not (resume and p3.is_complete()):
        import shutil

        hot_ref = ray.put(hot_terms)
        partials_dir = out / ".partials.tmp"
        if partials_dir.exists():
            shutil.rmtree(partials_dir)

        # map side: SPIMI tasks write compressed partials straight into
        # per-bucket directories (hash exchange through storage — no global
        # sort; see make_spimi_writer_fn)
        docs = rd.read_parquet(doc_files, columns=["doc_id", "text"])
        writes = docs.map_batches(
            make_spimi_writer_fn(hot_ref, cfg, str(partials_dir)),
            batch_format="pyarrow",
            batch_size=cfg.spimi_batch_size,
        )
        by_bucket: dict[int, list[str]] = {}
        for w in writes.take_all():
            by_bucket.setdefault(int(w["bucket"]), []).append(w["path"])
        _save_exec_stats(out, "p3-spimi-map", writes)

        # reduce side: one task per bucket. On wide single boxes more than
        # ~16 concurrent merges just thrash shared memory bandwidth (see
        # BASELINE.md §3), so each task claims extra CPU slots to cap
        # effective concurrency without changing results.
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        merge_cpus = max(1, ncpu // 16)
        merge_task = ray.remote(num_cpus=merge_cpus)(merge_bucket_files)
        # merge into a fresh tmp dir, then swap atomically: a rebuild whose
        # new bucket set doesn't cover the old one (n_buckets reduced, input
        # shrank) must never leave stale bucket files for the reader's glob
        # to pick up alongside fresh ones (mirrors the P0 docstore pattern)
        seg_tmp = out / ".segments.tmp"
        if seg_tmp.exists():
            shutil.rmtree(seg_tmp)
        futs = [
            merge_task.remote(files, str(seg_tmp), stats["avgdl"], cfg)
            for _, files in sorted(by_bucket.items())
        ]
        rows = ray.get(futs)
        rows.sort(key=lambda r: r["bucket"])
        shutil.rmtree(partials_dir, ignore_errors=True)
        if segments_dir.exists():
            shutil.rmtree(segments_dir)
        seg_tmp.rename(segments_dir)
        for r in rows:  # lineage paths must point at the final location
            r["path"] = str(segments_dir / Path(r["path"]).name)
        atomic_write_json(seg_manifest_path, {"buckets": rows})
        p3.seal(
            n_buckets=len(rows),
            n_postings=sum(r["n_postings"] for r in rows),
            bytes_shuffled=sum(r["bytes_in"] for r in rows),
            bytes_segments=sum(r["bytes_out"] for r in rows),
        )
    metrics["phases"]["segments"] = round(time.perf_counter() - t0, 3)

    seg_manifest = read_json(seg_manifest_path)
    metrics.update(
        N=stats["N"],
        avgdl=stats["avgdl"],
        n_hot_terms=len(hot_terms),
        n_postings=sum(r["n_postings"] for r in seg_manifest["buckets"]),
        bytes_shuffled=sum(r["bytes_in"] for r in seg_manifest["buckets"]),
        bytes_segments=sum(r["bytes_out"] for r in seg_manifest["buckets"]),
    )
    total = sum(metrics["phases"].values())
    metrics["wall_sec"] = round(total, 3)
    metrics["docs_per_sec"] = round(stats["N"] / total, 1) if total else None
    metrics["postings_per_sec"] = round(metrics["n_postings"] / total, 1) if total else None
    atomic_write_json(out / "metrics.json", metrics)
    return metrics
