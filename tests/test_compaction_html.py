"""Compaction (LogMergePolicy + physical segment merge) and HTML
extraction tests."""

import os

import pyarrow as pa
import pytest

from tantivy_ray.index import build_index, delete_by_term, load_manifest
from tantivy_ray.index.compaction import LogMergePolicy, compact
from tantivy_ray.pipelines.html_extract import ExtractTextStage, extract_text
from tantivy_ray.search import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestPolicy:
    def test_same_level_groups(self):
        p = LogMergePolicy(min_num_segments=3)
        segs = [{"segment_ord": i, "num_docs": 5000} for i in range(4)]
        assert p.compute_merge_candidates(segs) == [[0, 1, 2, 3]]

    def test_too_few_no_merge(self):
        p = LogMergePolicy(min_num_segments=8)
        segs = [{"segment_ord": i, "num_docs": 5000} for i in range(4)]
        assert p.compute_merge_candidates(segs) == []

    def test_levels_split(self):
        p = LogMergePolicy(min_num_segments=2, min_layer_size=100)
        segs = ([{"segment_ord": i, "num_docs": 500} for i in range(2)]
                + [{"segment_ord": 10 + i, "num_docs": 500_000} for i in range(2)])
        groups = p.compute_merge_candidates(segs)
        assert [10, 11] in groups and [0, 1] in groups

    def test_max_docs_guard(self):
        p = LogMergePolicy(min_num_segments=2, max_docs_before_merge=1000)
        segs = [{"segment_ord": i, "num_docs": 5000} for i in range(4)]
        assert p.compute_merge_candidates(segs) == []


@pytest.mark.usefixtures("ray_session")
class TestCompaction:
    def test_compact_preserves_results(self, tmp_path):
        idx = str(tmp_path / "ix")
        build_index(DOCS, idx, id_col="doc_id", docs_per_segment=100,
                    fast_fields=["text"])
        s = IndexSearcher(idx)
        q = ["table", "merge", "window"]
        # (scores survive; DocAddresses change by design at merge)
        before = [(h[0], len(s.hydrate([h])) and s.hydrate([h])[0]["doc_id"])
                  for h in s.search(q, "or", 15)]
        m0 = load_manifest(idx)
        assert len(m0.segments) == 5

        res = compact(idx, LogMergePolicy(min_num_segments=3,
                                          min_layer_size=10))
        assert res["new_segments"]
        m1 = load_manifest(idx)
        assert len(m1.segments) < len(m0.segments)
        assert m1.total_num_docs == m0.total_num_docs
        # old dirs removed, new dir present
        names = set(os.listdir(idx))
        assert f"seg-{res['new_segments'][0]:05d}" in names

        s2 = IndexSearcher(idx)
        after = [(h[0], s2.hydrate([h])[0]["doc_id"])
                 for h in s2.search(q, "or", 15)]
        assert after == before  # same docs, identical f32 scores

    def test_compact_preserves_positions(self, tmp_path):
        """Phrase queries still work after compaction (positions are
        rebuilt with the compacted segments per the manifest flag) and
        return the same docs with identical f32 scores."""
        idx = str(tmp_path / "ixp")
        build_index(DOCS, idx, id_col="doc_id", docs_per_segment=100,
                    record_positions=True, fast_fields=["text"])
        s = IndexSearcher(idx)
        phrase = ["table", "scan"]
        before = [(h[0], s.hydrate([h])[0]["doc_id"])
                  for h in s.search_phrase(phrase, 10)]
        assert before  # the corpus contains the phrase
        res = compact(idx, LogMergePolicy(min_num_segments=3,
                                          min_layer_size=10))
        assert res["new_segments"]
        s2 = IndexSearcher(idx)
        after = [(h[0], s2.hydrate([h])[0]["doc_id"])
                 for h in s2.search_phrase(phrase, 10)]
        assert after == before

    def test_compact_with_deletes_equals_fresh_rebuild(self, tmp_path):
        """After dropping deletes, compaction updates global stats (the
        reference's merge-updates-stats semantics): the compacted index
        must score exactly like a fresh build over only the alive docs."""
        import pyarrow.parquet as pq

        idx = str(tmp_path / "ix")
        build_index(DOCS, idx, id_col="doc_id", docs_per_segment=100,
                    fast_fields=["text"])
        delete_by_term(idx, "dup")
        compact(idx, LogMergePolicy(min_num_segments=3, min_layer_size=10))
        s = IndexSearcher(idx)

        t = pq.read_table(DOCS, columns=["doc_id", "text"])
        alive = set(
            int(x) for r in s.readers
            for x in r.doc_keys().column("doc_id").to_pylist()
        )
        mask = pa.array([int(d) in alive for d in t.column("doc_id").to_pylist()])
        alive_path = str(tmp_path / "alive.parquet")
        pq.write_table(t.filter(mask), alive_path)
        ref = str(tmp_path / "ref")
        build_index(alive_path, ref, id_col="doc_id",
                    docs_per_segment=100_000)
        s2 = IndexSearcher(ref)
        for terms in (["table", "merge"], ["window"], ["the", "a"]):
            a = {s.hydrate([h])[0]["doc_id"]: h[0]
                 for h in s.search(terms, "or", 10)}
            b = {s2.hydrate([h])[0]["doc_id"]: h[0]
                 for h in s2.search(terms, "or", 10)}
            assert a == b  # exact f32 score equality

    def test_compact_drops_deleted(self, tmp_path):
        idx = str(tmp_path / "ix")
        build_index(DOCS, idx, id_col="doc_id", docs_per_segment=100,
                    fast_fields=["text"])
        delete_by_term(idx, "dup")
        n_dead = sum(IndexSearcher(idx).readers[i].num_deleted
                     for i in range(5))
        assert n_dead > 0
        compact(idx, LogMergePolicy(min_num_segments=3, min_layer_size=10))
        m = load_manifest(idx)
        assert m.total_num_docs == 500 - n_dead  # physically dropped
        s = IndexSearcher(idx)
        assert s.search(["dup"], "or", 10) == []


class TestHtmlExtract:
    def test_extract_text(self):
        html = (b"<html><head><title>T</title><style>p{}</style></head>"
                b"<body><h1>Hello</h1><p>World &amp; friends</p>"
                b"<script>var x=1;</script><!-- c --></body></html>")
        assert extract_text(html) == "Hello World & friends"

    def test_deterministic_and_empty(self):
        assert extract_text(b"") == ""
        h = b"<p>a</p><p>b</p>"
        assert extract_text(h) == extract_text(h) == "a b"

    def test_stage(self):
        t = pa.table({
            "url": ["u1"],
            "html": pa.array([b"<p>Some <b>bold</b> text</p>"],
                             type=pa.binary()),
        })
        out = ExtractTextStage()(t)
        assert out.column("text").to_pylist() == ["Some bold text"]
