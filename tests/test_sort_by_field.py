"""Segment sort-by-field (reference IndexSettings::sort_by_field +
DocIdMapping, src/indexer/doc_id_mapping.rs:14): doc ids follow the sort
field; query results are identical to the unsorted index module doc-id
permutation."""

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import SegmentReader, build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import TermQuery, count_query, topk_by_fast_field

DOCS = [
    ("u0", "alpha beta gamma", 17),
    ("u1", "beta beta delta", 42),
    ("u2", "gamma alpha", 5),
    ("u3", "delta epsilon beta", 99),
    ("u4", "alpha", 3),
    ("u5", "epsilon gamma beta alpha", 61),
]


def _build(tmp, sort_by=None):
    t = pa.table({
        "url": [d[0] for d in DOCS],
        "text": [d[1] for d in DOCS],
        "nch": pa.array([d[2] for d in DOCS], type=pa.int64()),
    })
    meta = build_segment_from_table(
        t, 0, str(tmp), fast_fields=["nch"], sort_by=sort_by)
    write_manifest(str(tmp), IndexManifest(segments=[meta]))
    return str(tmp)


class TestSortByField:
    def test_docs_serialized_in_field_order(self, tmp_path_factory):
        ix = _build(tmp_path_factory.mktemp("sorted"), sort_by=("nch", "asc"))
        r = SegmentReader(f"{ix}/seg-00000")
        keys = r.doc_keys().column("url").to_pylist()
        vals = [d[2] for d in DOCS]
        expect = [DOCS[i][0] for i in np.argsort(vals, kind="stable")]
        assert keys == expect
        assert r.meta["sort_by"] == ["nch", "asc"]

    def test_desc_order(self, tmp_path_factory):
        ix = _build(tmp_path_factory.mktemp("sd"), sort_by=("nch", "desc"))
        r = SegmentReader(f"{ix}/seg-00000")
        ff = r.doc_keys()
        nch = ff.column("nch").to_pylist() if "nch" in ff.column_names \
            else None
        if nch is not None:
            assert nch == sorted(nch, reverse=True)

    def test_query_parity_with_unsorted(self, tmp_path_factory):
        plain = IndexSearcher(_build(tmp_path_factory.mktemp("plain")))
        sortd = IndexSearcher(
            _build(tmp_path_factory.mktemp("sortd"), sort_by=("nch", "asc")))
        for term in ("alpha", "beta", "gamma", "delta", "epsilon", "zzz"):
            q = TermQuery(term)
            c1 = count_query(plain.readers, q, plain.total_num_docs,
                             plain.average_fieldnorm, plain.doc_freq)
            c2 = count_query(sortd.readers, q, sortd.total_num_docs,
                             sortd.average_fieldnorm, sortd.doc_freq)
            assert c1 == c2

        # top-by-fast-field returns the same DOC KEYS in the same order
        # (nch values are unique, so the order is fully determined)
        def keys_of(s, descending):
            hits = topk_by_fast_field(
                s.readers, TermQuery("beta"), "nch", 3, descending,
                s.total_num_docs, s.average_fieldnorm, s.doc_freq)
            key_arr = {r.segment_ord: r.doc_keys().column("url").to_pylist()
                       for r in s.readers}
            return [key_arr[seg][doc] for _, seg, doc in hits]

        for desc in (True, False):
            assert keys_of(plain, desc) == keys_of(sortd, desc)

    def test_bm25_scores_identical(self, tmp_path_factory):
        from tantivy_ray.search.query import evaluate_topk

        plain = IndexSearcher(_build(tmp_path_factory.mktemp("p2")))
        sortd = IndexSearcher(
            _build(tmp_path_factory.mktemp("s2"), sort_by=("nch", "asc")))

        def scored(s):
            hits = evaluate_topk(
                s.readers, TermQuery("beta"), s.total_num_docs,
                s.average_fieldnorm, 10, s.doc_freq)
            keys = {r.segment_ord: r.doc_keys().column("url").to_pylist()
                    for r in s.readers}
            return sorted((keys[seg][doc], score)
                          for score, seg, doc in hits)

        assert scored(plain) == scored(sortd)


@pytest.mark.usefixtures("ray_session")
class TestSortSurvivesCompaction:
    def test_compacted_segment_keeps_sort(self, tmp_path):
        from tantivy_ray.index.build import build_index
        from tantivy_ray.index.compaction import LogMergePolicy, compact
        from tantivy_ray.index.manifest import load_manifest
        import pyarrow.parquet as pq_
        import random

        rnd = random.Random(5)
        t = pa.table({
            "url": [f"u{i}" for i in range(40)],
            "text": [f"alpha w{rnd.randint(0, 9)} beta" for _ in range(40)],
            "nch": pa.array([rnd.randint(0, 1000) for _ in range(40)],
                            type=pa.int64()),
        })
        src = str(tmp_path / "src.parquet")
        pq_.write_table(t, src)
        idx = str(tmp_path / "ix")
        build_index(src, idx, docs_per_segment=10,
                    fast_fields=["nch", "text"], sort_by=("nch", "asc"))
        compact(idx, LogMergePolicy(min_num_segments=2, min_layer_size=2))
        m = load_manifest(idx)
        compacted = [s for s in m.segments
                     if s.get("lineage", {}).get("compacted_from")]
        assert compacted, "compaction must have merged something"
        for s in compacted:
            assert s["sort_by"] == ["nch", "asc"]
            r = SegmentReader(f"{idx}/seg-{s['segment_ord']:05d}")
            nch = r.doc_keys().column("nch").to_pylist()
            assert nch == sorted(nch)
