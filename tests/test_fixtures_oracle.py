from pathlib import Path

import pyarrow.parquet as pq

from gxdindexer_ray.fixtures import generate_pages, generate_queries
from gxdindexer_ray.fixtures.pages import HOT_TERM
from gxdindexer_ray.text.extract import extract_text


def test_pages_deterministic(tmp_path):
    d1 = generate_pages(tmp_path / "a", 300, seed=42)
    d2 = generate_pages(tmp_path / "b", 300, seed=42)
    f1 = sorted(Path(d1).glob("*.parquet"))
    f2 = sorted(Path(d2).glob("*.parquet"))
    assert [f.name for f in f1] == [f.name for f in f2]
    for a, b in zip(f1, f2):
        assert a.read_bytes() == b.read_bytes()


def test_pages_idempotent_cache(tmp_path):
    d = generate_pages(tmp_path / "c", 100, seed=42)
    mtimes = {f.name: f.stat().st_mtime_ns for f in Path(d).glob("*.parquet")}
    generate_pages(tmp_path / "c", 100, seed=42)
    assert {f.name: f.stat().st_mtime_ns for f in Path(d).glob("*.parquet")} == mtimes


def test_pages_edge_rows(pages_1k):
    t = pq.read_table(sorted(Path(pages_1k).glob("*.parquet"))[0])
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    texts = t["text"].to_pylist()

    # duplicates present (i % 997 == 0 duplicated)
    assert len(urls) > len(set(urls))

    n_null = sum(h is None for h in htmls)
    assert n_null > 0
    for h, txt in zip(htmls, texts):
        if h is None:
            assert txt is None
        else:
            assert txt == extract_text(h)  # text column IS the golden extraction

    # hot term in roughly 2/3 of docs
    hot = sum(1 for txt in texts if txt and HOT_TERM in txt.split())
    assert hot > len(texts) * 0.5

    # a large doc exists (row 5 of tier >= 6 rows)
    assert any(h is not None and len(h) > 400_000 for h in htmls)


def test_queries_shape():
    q = generate_queries(50, seed=42)
    assert q.num_rows == 50
    ks = set(q["k"].to_pylist())
    assert ks == {1, 10, 100}
    assert all(len(s) > 0 for s in q["query"].to_pylist())


def test_oracle_smoke(oracle_1k):
    ix = oracle_1k
    assert ix.N > 900  # 1000 minus nothing; dups collapse back to 1000 originals
    assert ix.avgdl > 10
    stats = ix.term_stats()
    assert HOT_TERM in stats
    df, cf = stats[HOT_TERM]
    assert df > ix.N * 0.5
    top = ix.topk(HOT_TERM, 10)
    assert len(top) == 10
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)


def test_oracle_dedup_first_wins(pages_1k):
    from gxdindexer_ray.oracle import OracleIndex

    t = pq.read_table(sorted(Path(pages_1k).glob("*.parquet"))[0], columns=["url", "warc_ts", "html"])
    import pyarrow as pa

    ts = t["warc_ts"].cast(pa.int64()).to_pylist()
    rows = list(zip(t["url"].to_pylist(), ts, t["html"].to_pylist()))
    dup_urls = {u for u in t["url"].to_pylist() if t["url"].to_pylist().count(u) > 1}
    ix = OracleIndex.build_from_rows(rows)
    for u in dup_urls:
        cand = [(r[1], r[2] or b"") for r in rows if r[0] == u]
        first_ts, first_html = min(cand)
        assert ix.text_by_url[u] == extract_text(first_html)
