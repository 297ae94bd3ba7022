"""Enrichment-parity pack (T1-T13/D2/M12 semantics) and CLI registry tests."""

import numpy as np
import pandas as pd
import pytest


def test_nodup_extend_order_preserving():
    from gxdindexer_ray.pipelines.enrich import nodup_extend

    acc, seen = [], set()
    nodup_extend(acc, seen, ["b", "a", "b", "c", "a"])
    assert acc == ["b", "a", "c"]  # first-occurrence order, dups suppressed
    nodup_extend(acc, seen, ["c", "d"])
    assert acc == ["b", "a", "c", "d"]


def test_position_boost_decay():
    from gxdindexer_ray.pipelines.enrich import position_boost

    assert position_boost(0) == 100.0
    assert position_boost(1) == pytest.approx(100 / 1.5)
    assert position_boost(50) == 1.0  # floored


def test_side_tables_deterministic():
    from gxdindexer_ray.fixtures.pages import vocabulary
    from gxdindexer_ray.fixtures.sidetables import site_attrs, term_ancestors, term_synonyms

    v = vocabulary(42)
    assert site_attrs(42).equals(site_attrs(42))
    assert term_synonyms(v, 42).equals(term_synonyms(v, 42))
    anc = term_ancestors(v, 42)
    assert anc.equals(term_ancestors(v, 42))
    # closure property: ancestor-of-ancestor is an ancestor
    pairs = set(zip(anc["term"].to_pylist(), anc["ancestor"].to_pylist()))
    by_term: dict[str, set] = {}
    for t, a in pairs:
        by_term.setdefault(t, set()).add(a)
    for t, ancs in list(by_term.items())[:100]:
        for a in ancs:
            assert by_term.get(a, set()) <= ancs, (t, a)


def test_enrich_docs_semantics(ray_session, pages_1k, tmp_path):
    import ray.data as rd

    from gxdindexer_ray.config import IndexConfig
    from gxdindexer_ray.fixtures.pages import vocabulary
    from gxdindexer_ray.pipelines import build_index
    from gxdindexer_ray.pipelines.enrich import build_side_state, enrich_docs, position_boost
    from gxdindexer_ray.text.tokenize import tokenize

    out = tmp_path / "ix"
    build_index(pages_1k, out, IndexConfig())
    docs = rd.read_parquet(str(out / "docs"), columns=["doc_id", "url", "text"])
    docs_pd = docs.to_pandas()
    side = build_side_state(vocabulary(42), docs_pd["url"].tolist())
    enriched = enrich_docs(docs, side).to_pandas().set_index("url")

    assert len(enriched) == len(docs_pd)
    checked_anc = checked_lab = 0
    for _, row in docs_pd.head(300).iterrows():
        e = enriched.loc[row["url"]]
        # site attrs: J1 broadcast join, J3 null-on-miss
        assert e["site"].startswith("site")
        cat, reg = side["site_attrs"][e["site"]]
        assert e["category"] == cat and e["region"] == reg

        # top terms: tf desc, term asc, k=5, from the frozen tokenizer
        toks = tokenize(row["text"])
        if toks:
            from collections import Counter

            cnt = Counter(toks)
            expected = [t for _, t in sorted((-c, t) for t, c in cnt.items())[:5]]
            assert list(e["top_terms"]) == expected
            assert list(e["term_boosts"]) == [position_boost(j) for j in range(len(expected))]

            # expanded = top terms + ancestors, order-preserving nodup (D2/T7)
            exp = list(e["expanded_terms"])
            assert exp[: len(expected)] == expected
            assert len(exp) == len(set(exp))
            for t in expected:
                for a in side["ancestors"].get(t, []):
                    assert a in exp
                    checked_anc += 1
        # labels deduped (T12/D2)
        labs = list(e["labels"])
        assert len(labs) == len(set(labs))
        if row["url"] in side["labels"]:
            assert set(labs) == set(side["labels"][row["url"]])
            checked_lab += 1
    assert checked_anc > 0 and checked_lab > 0


def test_enrich_degrades_on_side_table_failure(ray_session, caplog):
    """A failing optional side-table load degrades to empty with a logged
    error instead of failing the build (reference per-cache try/catch,
    GxdResultIndexer.java:770-798: 'no GO terms will be indexed')."""
    import logging

    import ray.data as rd

    from gxdindexer_ray.fixtures.pages import vocabulary
    from gxdindexer_ray.pipelines.enrich import build_side_state, enrich_docs

    def boom():
        raise RuntimeError("synonyms source unavailable")

    urls = [f"https://site{i}.example.com/p" for i in range(4)]
    with caplog.at_level(logging.ERROR, logger="gxdindexer_ray.pipelines.enrich"):
        side = build_side_state(vocabulary(42), urls, loaders={"synonyms": boom})
    assert side["synonyms"] == {}
    assert any("synonyms" in r.message for r in caplog.records)
    assert side["ancestors"]  # the other tables still loaded

    docs = rd.from_items([
        {"doc_id": i, "url": urls[i], "text": "hash merge scan hash"}
        for i in range(4)])
    enriched = enrich_docs(docs, side).to_pandas()
    assert len(enriched) == 4
    assert all(len(s) == 0 for s in enriched["synonyms"])  # degraded field
    assert all(len(t) > 0 for t in enriched["top_terms"])  # rest intact


def test_pipeline_group_aliases():
    from gxdindexer_ray.pipelines.queries import CATALOG, GROUPS, expand_pipeline_names

    for g, members in GROUPS.items():
        assert members, g
        assert all(m in CATALOG for m in members), g
    assert expand_pipeline_names(["all"]) == list(CATALOG)
    assert expand_pipeline_names(["dedup"]) == GROUPS["dedup"]
    # order preserved, dups dropped, unknown names passed through
    got = expand_pipeline_names(["q30_knn", "similarity", "nope"])
    assert got[0] == "q30_knn" and got.count("q30_knn") == 1 and "nope" in got


def test_cli_list_and_run(ray_session, capsys):
    # `list` needs no ray; `run` reuses the active session via is_initialized
    from gxdindexer_ray.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q33_bm25_topk" in out

    rc = main(["run", "--pipeline", "q02_event_normalize", "--sf", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "ok" in capsys.readouterr().out

    rc = main(["run", "--pipeline", "nope_not_real", "--sf", "/root/testdata/sf0.001"])
    assert rc == 1


def test_cli_build_and_query(ray_session, tmp_path, capsys):
    from gxdindexer_ray.__main__ import main
    from gxdindexer_ray.fixtures import generate_pages

    pages = generate_pages(tmp_path / "pages", 200, seed=42)
    out = tmp_path / "ix"
    assert main(["build", "--pages", str(pages), "--out", str(out)]) == 0
    captured = capsys.readouterr().out
    assert '"N": 200' in captured
    assert (out / "stats.json").exists()
    assert (out / "_manifests" / "exec-stats-p0-docstore.txt").exists()

    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "3"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 3
    rank, doc, score = lines[0].split("\t")
    assert rank == "1" and float(score) > 0

    # --fq (Solr filter query): same scores, restricted set; an impossible
    # filter returns nothing
    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "3",
                 "--fq", "dl>=1"]) == 0
    fq_lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert fq_lines == lines
    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "3",
                 "--fq", "dl<0"]) == 0
    assert capsys.readouterr().out.strip() == ""

    # --facet / --collapse print (value, ...) rows over the match set
    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "2",
                 "--facet", "lang"]) == 0
    facet_rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert len(facet_rows) <= 2 and all(int(n) > 0 for _, n in facet_rows)
    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "2",
                 "--collapse", "lang"]) == 0
    col_rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert len(col_rows) <= 2 and all(float(s) > 0 for _, _, s in col_rows)

    # --snippets appends a highlight containing a query term
    assert main(["query", "--index", str(out), "--q", "zerg", "--k", "2",
                 "--snippets"]) == 0
    sn_rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert all(len(r) == 4 and "zerg" in r[3] for r in sn_rows)

    # suggest / mlt subcommands
    assert main(["suggest", "--index", str(out), "--prefix", "z", "--k", "3"]) == 0
    sug = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert any(t == "zerg" for t, _df, _cf in sug)
    src = sn_rows[0][1]
    assert main(["mlt", "--index", str(out), "--id", src, "--k", "3"]) == 0
    mlt_rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert mlt_rows and all(d != src for _r, d, _s in mlt_rows)
    assert main(["mlt", "--index", str(out), "--k", "3"]) == 2  # need --url/--id


def test_parse_doc_filter():
    import pytest as _pt

    from gxdindexer_ray.pipelines.search import parse_doc_filter

    f = parse_doc_filter("dl >= 50")
    assert f.key == "dl >= 50" and f.columns == ["dl"]
    assert parse_doc_filter("lang==en").columns == ["lang"]
    with _pt.raises(ValueError):
        parse_doc_filter("dl ~= 50")
    with _pt.raises(ValueError):
        parse_doc_filter("no_operator")


def test_cli_run_concurrent_longest_first(ray_session, capsys, tmp_path, monkeypatch):
    """--concurrent N runs pipelines through a worker pool, longest-first
    from persisted prior timings (U4; reference bin/buildIndexes:175-207)."""
    import json
    from pathlib import Path

    from gxdindexer_ray.__main__ import main

    timings = Path("/tmp/gxdray/pipeline_timings.json")
    timings.parent.mkdir(parents=True, exist_ok=True)
    timings.write_text(json.dumps({"q02_event_normalize": 99.0, "q13_global_minmax": 1.0}))

    rc = main(["run", "--pipeline", "q13_global_minmax", "q02_event_normalize",
               "--sf", "/root/testdata/sf0.001", "--concurrent", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "q02_event_normalize\tok" in out and "q13_global_minmax\tok" in out
    # timings refreshed with this run's measurements
    saved = json.loads(timings.read_text())
    assert saved["q02_event_normalize"] < 99.0


def test_cli_spell_index_lifecycle(ray_session, tmp_path, capsys):
    """spell-index builds + seals the SymSpell artifact; spellcheck uses it
    when fresh, and falls back to the scan when the manifest goes stale
    (same output either way)."""
    import json

    from gxdindexer_ray.__main__ import main
    from gxdindexer_ray.fixtures import generate_pages

    pages = generate_pages(tmp_path / "pages", 200, seed=42)
    out = tmp_path / "ix"
    assert main(["build", "--pages", str(pages), "--out", str(out)]) == 0
    capsys.readouterr()

    assert main(["spell-index", "--index", str(out), "--max-dist", "1"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_variants"] > 0
    assert (out / "symspell_d1").is_dir()
    assert (out / "symspell_d1_manifest.json").exists()

    assert main(["spellcheck", "--index", str(out), "--term", "zerh",
                 "--k", "3", "--max-dist", "1"]) == 0
    fresh_rows = capsys.readouterr().out.strip().splitlines()
    assert any(r.split("\t")[0] == "zerg" for r in fresh_rows)

    # stale manifest (lexicon-size mismatch) -> scan fallback, same rows
    man_path = out / "symspell_d1_manifest.json"
    man = json.loads(man_path.read_text())
    man["n_terms"] += 1
    man_path.write_text(json.dumps(man))
    assert main(["spellcheck", "--index", str(out), "--term", "zerh",
                 "--k", "3", "--max-dist", "1"]) == 0
    assert capsys.readouterr().out.strip().splitlines() == fresh_rows
