"""Snippet generator + MoreLikeThis tests (reference src/snippet/mod.rs,
src/query/more_like_this/)."""

import pyarrow as pa
import pytest

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.more_like_this import MoreLikeThis
from tantivy_ray.search.snippet import SnippetGenerator


class TestSnippet:
    def test_best_fragment_and_highlights(self):
        text = ("Rust is a systems programming language. "
                "It runs blazingly fast, prevents segfaults, "
                "and guarantees thread safety.")
        gen = SnippetGenerator({"rust": 1.0, "fast": 1.0}, max_num_chars=50)
        sn = gen.snippet(text)
        assert "Rust" in sn.fragment or "fast" in sn.fragment
        assert sn.score > 0
        html = sn.to_html()
        assert "<b>" in html

    def test_highlight_ranges_exact(self):
        gen = SnippetGenerator({"fox": 1.0}, max_num_chars=100)
        sn = gen.snippet("the quick fox jumps")
        (s, e), = sn.highlighted
        assert sn.fragment[s:e].lower() == "fox"

    def test_distinct_term_scoring(self):
        # fragment with two distinct terms beats one with a repeated term
        text = "alpha alpha alpha . . . . . . . . . . . beta gamma"
        gen = SnippetGenerator({"alpha": 1.0, "beta": 1.0, "gamma": 1.0},
                               max_num_chars=12)
        sn = gen.snippet(text)
        assert "beta" in sn.fragment and "gamma" in sn.fragment

    def test_no_match_leading_fragment(self):
        gen = SnippetGenerator({"zzz": 1.0}, max_num_chars=10)
        sn = gen.snippet("hello world this is text")
        assert sn.score == 0.0 and sn.highlighted == []
        assert sn.fragment == "hello worl"

    def test_html_escaping(self):
        gen = SnippetGenerator({"fox": 1.0}, max_num_chars=100)
        sn = gen.snippet("<b>the</b> fox & friends")
        html = sn.to_html()
        # markup inside the fragment is escaped; only the highlight emits tags
        assert "&lt;/b&gt;" in html and "&amp;" in html
        assert "<b>fox</b>" in html

    def test_unicode_offsets(self):
        gen = SnippetGenerator({"текст": 1.0}, max_num_chars=100)
        sn = gen.snippet("Русский текст здесь")
        (s, e), = sn.highlighted
        assert sn.fragment[s:e] == "текст"


@pytest.fixture(scope="module")
def mlt_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlt")
    corpus = [
        "rust systems programming language fast safe",
        "python scripting language slow easy",
        "rust memory safety ownership borrow checker",
        "java virtual machine garbage collector language",
        "cooking recipes pasta tomato basil",
        "gardening tomato plants soil watering",
    ]
    t = pa.table({"url": [str(i) for i in range(len(corpus))],
                  "text": corpus})
    meta = build_segment_from_table(t, 0, str(d))
    write_manifest(str(d), IndexManifest(segments=[meta]))
    return IndexSearcher(str(d))


class TestMoreLikeThis:
    def test_finds_similar(self, mlt_index):
        mlt = MoreLikeThis(min_doc_frequency=1, max_query_terms=10)
        hits = mlt.search("rust language safety", mlt_index, k=3)
        top_docs = [h[2] for h in hits]
        # docs 0 and 2 are the rust docs
        assert set(top_docs[:2]) == {0, 2}

    def test_filters(self, mlt_index):
        mlt = MoreLikeThis(min_doc_frequency=3)  # only df>=3 terms survive
        q = mlt.query_for_text("rust language safety", mlt_index)
        terms = {b.query.term for b in q.should}
        assert terms == {"language"}  # df('language')=3, rust=2, safety=1

    def test_empty_when_nothing_survives(self, mlt_index):
        mlt = MoreLikeThis(min_doc_frequency=10)
        hits = mlt.search("rust language", mlt_index, k=5)
        assert hits == []
