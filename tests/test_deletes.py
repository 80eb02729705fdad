"""Deletes: tombstones + alive filtering + physical drop at merge
(reference ARCHITECTURE.md §Deletes, src/fastfield/alive_bitset.rs)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.index import build_index, delete_by_term, load_manifest
from tantivy_ray.index.deletes import add_tombstones, read_tombstones
from tantivy_ray.index.merge import MergedIndexReader, merge_segments
from tantivy_ray.index.segment import SegmentReader, build_segment_from_table
from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.search import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestTombstones:
    def test_roundtrip_and_union(self, tmp_path):
        t = pa.table({"url": ["a", "b", "c"], "text": ["x", "y", "z"]})
        build_segment_from_table(t, 0, str(tmp_path))
        seg = str(tmp_path / "seg-00000")
        assert read_tombstones(seg) is None
        add_tombstones(seg, [2, 0])
        assert read_tombstones(seg).tolist() == [0, 2]
        add_tombstones(seg, [1, 2])
        assert read_tombstones(seg).tolist() == [0, 1, 2]
        r = SegmentReader(seg)
        assert r.num_deleted == 3
        assert not r.alive_mask.any()


@pytest.mark.usefixtures("ray_session")
class TestDeleteByTerm:
    @pytest.fixture()
    def idx(self, tmp_path):
        p = str(tmp_path / "ix")
        build_index(DOCS, p, id_col="doc_id", docs_per_segment=150)
        return p

    def test_delete_excludes_from_search(self, idx):
        s = IndexSearcher(idx)
        before = s.search(["dup"], "or", 50)
        assert len(before) > 0
        deleted = delete_by_term(idx, "dup")
        assert sum(deleted.values()) == len(
            set((h[1], h[2]) for h in s.search(["dup"], "or", 1000)))
        s2 = IndexSearcher(idx)  # fresh snapshot sees tombstones
        assert s2.search(["dup"], "or", 50) == []
        # other queries exclude the deleted docs but still work
        hits = s2.search(["table", "merge"], "or", 20)
        dead = {(seg, d) for seg_ord, n in deleted.items()
                for r in s2.readers if r.segment_ord == seg_ord
                for seg, d in [(seg_ord, int(x)) for x in
                               np.flatnonzero(~r.alive_mask)]}
        assert all((h[1], h[2]) not in dead for h in hits)
        # wand agrees
        assert s2.search(["table", "merge"], "or", 20, use_wand=True) == hits

    def test_stats_unchanged_until_merge(self, idx):
        s = IndexSearcher(idx)
        df_before = s.doc_freq("dup")
        delete_by_term(idx, "dup")
        s2 = IndexSearcher(idx)
        # doc_freq still counts deleted docs (reference: stats update at
        # merge, not delete)
        assert s2.doc_freq("dup") == df_before

    def test_merge_drops_deleted(self, idx, tmp_path):
        delete_by_term(idx, "dup")
        merged = str(tmp_path / "merged")
        merge_segments(idx, merged, num_buckets=4)
        r = MergedIndexReader(merged)
        assert r.postings("dup") is None or r.doc_freq("dup") == 0

    def test_query_evaluator_respects_deletes(self, idx):
        from tantivy_ray.search.query import AllQuery, TermQuery

        s = IndexSearcher(idx)
        n_all = len(s.search_query(AllQuery(), 10_000))
        delete_by_term(idx, "dup")
        s2 = IndexSearcher(idx)
        n_deleted = sum(r.num_deleted for r in s2.readers)
        assert n_deleted > 0
        assert len(s2.search_query(AllQuery(), 10_000)) == n_all - n_deleted
        assert s2.search_query(TermQuery("dup"), 10) == []
