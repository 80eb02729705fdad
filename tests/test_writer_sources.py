"""IndexWriter facade + sources tests (reference IndexWriter usage:
examples/basic_search.rs — add_document/commit/search)."""

import json

import pytest

from tantivy_ray.search import IndexSearcher
from tantivy_ray.sources import IndexWriter, pages_from_json


@pytest.mark.usefixtures("ray_session")
class TestIndexWriter:
    def test_add_commit_search(self, tmp_path):
        w = IndexWriter(str(tmp_path), docs_per_segment=3)
        w.add_documents([
            {"url": "a", "text": "old man and the sea"},
            {"url": "b", "text": "of mice and men"},
            {"url": "c", "text": "the sea wolf"},       # flush #1 here
            {"url": "d", "text": "frankenstein monster"},
        ])
        m = w.commit()
        assert m.total_num_docs == 4
        assert len(m.segments) == 2  # 3-doc flush + 1-doc commit seal
        s = IndexSearcher(str(tmp_path))
        hits = s.search(["sea"], "or", 5)
        assert len(hits) == 2

    def test_incremental_commits_append_segments(self, tmp_path):
        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        w.add_document({"url": "a", "text": "hello world"})
        w.commit()
        w2 = IndexWriter(str(tmp_path), docs_per_segment=10)
        w2.add_document({"url": "b", "text": "hello again"})
        m = w2.commit()
        assert m.total_num_docs == 2
        assert [s["segment_ord"] for s in m.segments] == [0, 1]
        s = IndexSearcher(str(tmp_path))
        assert len(s.search(["hello"], "or", 5)) == 2

    def test_rollback(self, tmp_path):
        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        w.add_document({"url": "a", "text": "kept"})
        w.commit()
        w.add_document({"url": "b", "text": "dropped"})
        assert w.rollback() == 1
        m = w.commit()
        assert m.total_num_docs == 1

    def test_delete_queue_applied_at_commit(self, tmp_path):
        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        w.add_documents([
            {"url": "a", "text": "spam spam spam"},
            {"url": "b", "text": "useful content"},
        ])
        w.commit()
        w2 = IndexWriter(str(tmp_path), docs_per_segment=10)
        w2.delete_by_term("spam")
        w2.commit()
        s = IndexSearcher(str(tmp_path))
        assert s.search(["spam"], "or", 5) == []
        assert len(s.search(["useful"], "or", 5)) == 1

    def test_json_source(self, tmp_path):
        p = tmp_path / "docs.jsonl"
        with open(p, "w") as f:
            for i in range(5):
                f.write(json.dumps({"url": f"u{i}", "text": f"doc number {i}"}) + "\n")
        ds = pages_from_json(str(p))
        rows = ds.take_all()
        assert len(rows) == 5 and rows[0]["text"].startswith("doc")


@pytest.mark.usefixtures("ray_session")
class TestOpstamps:
    def test_monotonic_and_durable(self, tmp_path):
        from tantivy_ray.sources.writer import IndexWriter

        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        s1 = w.add_document({"url": "a", "text": "one two"})
        s2 = w.add_document({"url": "b", "text": "three"})
        s3 = w.delete_by_term("zzz")
        assert [s1, s2, s3] == [1, 2, 3]
        w.commit()
        assert w.committed_opstamp == 3

        # rollback rewinds to the committed stamp
        w.add_document({"url": "c", "text": "four"})
        assert w.opstamp == 4
        w.rollback()
        assert w.opstamp == 3

        # a new writer resumes past the committed stamp
        w2 = IndexWriter(str(tmp_path), docs_per_segment=10)
        assert w2.opstamp == 3
        assert w2.add_document({"url": "d", "text": "five"}) == 4
