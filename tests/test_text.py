import numpy as np
import pyarrow as pa

from gxdindexer_ray.text.extract import extract_column, extract_text
from gxdindexer_ray.text.tokenize import doc_term_counts, tokenize, tokenize_column


class TestExtract:
    def test_null_and_empty(self):
        assert extract_text(None) == ""
        assert extract_text(b"") == ""

    def test_strips_tags_scripts_styles_comments(self):
        h = (b"<html><head><script>var x = '<p>no</p>';</script>"
             b"<style>p{color:red}</style></head>"
             b"<body><!-- secret --><p>hello <b>world</b></p></body></html>")
        assert extract_text(h) == "hello world"

    def test_entities_after_tag_strip(self):
        # &lt;b&gt; must NOT become a tag; &#233; decodes to é
        h = b"<p>a &lt;b&gt; c r&#233;sum&#233; &amp; more</p>"
        assert extract_text(h) == "a <b> c résumé & more"

    def test_whitespace_normalized(self):
        assert extract_text(b"<p>a\n\n  b\tc</p>  <div>d</div>") == "a b c d"

    def test_utf8_replace_on_bad_bytes(self):
        out = extract_text(b"<p>ok \xff\xfe broken</p>")
        assert "ok" in out and "broken" in out

    def test_column_matches_scalar(self):
        htmls = [b"<p>one</p>", None, b"", b"<p>caf\xc3\xa9</p>"]
        col = pa.array(htmls, type=pa.binary())
        out = extract_column(col).to_pylist()
        assert out == [extract_text(h) for h in htmls]


class TestTokenize:
    def test_basic(self):
        assert tokenize("Foo foo foo. bar2 BAZ") == ["foo", "foo", "foo", "bar2", "baz"]

    def test_empty_and_punct_only(self):
        assert tokenize("") == []
        assert tokenize("!!! ... ???") == []

    def test_unicode_dropped(self):
        # é is not in [a-z0-9] so it splits tokens
        assert tokenize("café bar") == ["caf", "bar"]

    def test_arrow_matches_scalar(self):
        texts = [
            "Foo foo foo. bar2 BAZ",
            "",
            "café résumé",
            "a b a b a",
            "x" * 100,
            None,
        ]
        col = pa.array(texts, type=pa.string())
        flat, doc_idx = tokenize_column(col)
        got: dict[int, list[str]] = {}
        for tok, d in zip(flat.to_pylist(), doc_idx):
            got.setdefault(int(d), []).append(tok)
        for i, t in enumerate(texts):
            expected = tokenize(t) if t else []
            assert got.get(i, []) == expected, f"row {i}"

    def test_doc_term_counts_matches_counter(self):
        from collections import Counter

        texts = ["a b a c", "b b b", "", "zz a zz"]
        col = pa.array(texts, type=pa.string())
        vocab, doc_idx, codes, tf = doc_term_counts(col)
        vlist = vocab.to_pylist()
        got: dict[int, dict[str, int]] = {}
        for d, c, n in zip(doc_idx, codes, tf):
            got.setdefault(int(d), {})[vlist[int(c)]] = int(n)
        for i, t in enumerate(texts):
            assert got.get(i, {}) == dict(Counter(tokenize(t)))
        # doc lengths recoverable
        dls = np.bincount(doc_idx, weights=tf, minlength=len(texts)).astype(int)
        assert dls.tolist() == [len(tokenize(t)) for t in texts]
