"""Multi-field schema tests: field-prefixed terms, per-field fieldnorms
and stats, field-scoped term/phrase queries, parser routing (reference
schema model SURVEY §1.1; term field prefix src/schema/term.rs:53-55)."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.analyzer import get_analyzer
from tantivy_ray.fieldnorm import FIELD_NORMS_TABLE
from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import SegmentReader, build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import PhraseQuery, TermQuery
from tantivy_ray.search.queryparser import QueryParser

TITLES = [
    "The Old Man and the Sea",
    "Of Mice and Men",
    "The Sea Wolf",
    "White Fang",
]
BODIES = [
    "an old fisherman battles a great fish far out at sea",
    "two drifters find work on a ranch in california",
    "a gentleman is forced to become a sailor on a seal hunting ship at sea",
    "a wild wolfdog's journey toward domestication in the yukon",
]


@pytest.fixture(scope="module")
def mf_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("mfix")
    t = pa.table({
        "url": [str(i) for i in range(len(BODIES))],
        "text": BODIES,
        "title": TITLES,
    })
    meta = build_segment_from_table(
        t, 0, str(d), record_positions=True,
        extra_text_fields={"title": "default"},
    )
    write_manifest(str(d), IndexManifest(
        segments=[meta], record_positions=True))
    return str(d)


class TestMultiFieldBuild:
    def test_field_stats_and_fieldnorms(self, mf_index):
        r = SegmentReader(mf_index + "/seg-00000")
        assert r.meta["field_stats"]["title"] == sum(
            len(get_analyzer("default").analyze(t)) for t in TITLES)
        tf = r.fieldnorm_ids_for("title")
        assert len(tf) == 4
        # title norms differ from body norms
        assert not np.array_equal(tf, r.fieldnorm_ids)

    def test_prefixed_terms_present(self, mf_index):
        r = SegmentReader(mf_index + "/seg-00000")
        assert r.doc_freq("title\x00sea") == 2    # titles 0, 2
        assert r.doc_freq("sea") == 2             # bodies 0, 2
        assert r.doc_freq("title\x00wolf") == 1


class TestFieldQueries:
    def test_term_field_scoping(self, mf_index):
        s = IndexSearcher(mf_index)
        title_hits = s.search_query(TermQuery("wolf", field="title"), 10)
        assert [h[2] for h in title_hits] == [2]
        body_hits = s.search_query(TermQuery("fisherman"), 10)
        assert [h[2] for h in body_hits] == [0]
        # same token, different fields, independent results
        assert {h[2] for h in s.search_query(TermQuery("sea", field="title"), 10)} == {0, 2}
        assert {h[2] for h in s.search_query(TermQuery("sea"), 10)} == {0, 2}

    def test_field_score_uses_field_stats(self, mf_index):
        """score must use the TITLE field's df/avg/fieldnorm, not the body's
        — verified against a from-scratch f32 BM25 on the title corpus."""
        s = IndexSearcher(mf_index)
        hits = s.search_query(TermQuery("sea", field="title"), 10)
        ana = get_analyzer("default")
        toks = [[t.text for t in ana.analyze(x)] for x in TITLES]
        n = len(TITLES)
        df = sum("sea" in t for t in toks)
        total_title_tokens = sum(len(t) for t in toks)
        avg = np.float32(np.float32(total_title_tokens) / np.float32(n))
        f32 = np.float32
        idf = np.log(f32(1.0) + (f32(n - df) + f32(0.5)) / (f32(df) + f32(0.5)),
                     dtype=np.float32)
        weight = f32(idf * f32(2.2))
        for score, _, doc in hits:
            tf = toks[doc].count("sea")
            fn = int(FIELD_NORMS_TABLE[
                np.searchsorted(FIELD_NORMS_TABLE, len(toks[doc]), side="right") - 1])
            norm = f32(f32(1.2) * (f32(0.25) + f32(0.75) * f32(fn) / avg))
            expected = f32(weight * f32(f32(tf) / f32(f32(tf) + norm)))
            assert score == float(expected), (doc, score, float(expected))

    def test_phrase_field_scoped(self, mf_index):
        s = IndexSearcher(mf_index)
        hits = s.search_query(PhraseQuery(["sea", "wolf"], field="title"), 10)
        assert [h[2] for h in hits] == [2]
        assert s.search_query(PhraseQuery(["sea", "wolf"]), 10) == []

    def test_parser_field_routing(self, mf_index):
        s = IndexSearcher(mf_index)
        p = QueryParser(default_fields=["text", "title"])
        q = p.parse("title:wolf")
        assert isinstance(q, TermQuery) and q.field == "title"
        assert s.search_query(q, 10) == s.search_query(
            TermQuery("wolf", field="title"), 10)
        # primary prefix stays unscoped
        q2 = p.parse("text:sea")
        assert isinstance(q2, TermQuery) and q2.field is None

    def test_primary_range_excludes_prefixed_terms(self, mf_index):
        from tantivy_ray.search.query import RangeQuery

        s = IndexSearcher(mf_index)
        # range covering 's'..'u' would lexicographically include
        # "title\x00..." terms; they must be filtered out
        hits = s.search_query(RangeQuery("s", "u"), 50)
        r = SegmentReader(mf_index + "/seg-00000")
        primary_terms = [t for t in r.terms()
                         if "\x00" not in t and "s" <= t < "u"]
        expected_docs = set()
        ana = get_analyzer("default")
        for di, b in enumerate(BODIES):
            toks = {t.text for t in ana.analyze(b)}
            if toks & set(primary_terms):
                expected_docs.add(di)
        assert {h[2] for h in hits} == expected_docs


class TestNumericTermFields:
    def test_encodings_order_preserving(self):
        import random

        from tantivy_ray.index.numeric import (
            decode_f64, decode_i64, encode_f64, encode_i64,
        )

        rs = random.Random(3)
        ints = [rs.randint(-2**62, 2**62) for _ in range(200)] + [0, -1, 1]
        encs = [encode_i64(v) for v in ints]
        assert sorted(encs) == [e for _, e in sorted(zip(ints, encs))]
        assert all(decode_i64(encode_i64(v)) == v for v in ints)

        floats = [rs.uniform(-1e9, 1e9) for _ in range(200)] + [0.0, -0.0, 1.5, -1.5]
        fencs = [encode_f64(v) for v in floats]
        order_by_val = [e for _, e in sorted(zip(floats, fencs))]
        assert sorted(fencs) == order_by_val
        assert all(decode_f64(encode_f64(v)) == v for v in floats if v == v)

    @pytest.mark.usefixtures("ray_session")
    def test_numeric_range_query_end_to_end(self, tmp_path):
        import ray.data as rd

        from tantivy_ray.index.build import build_index
        from tantivy_ray.index.numeric import EncodeNumericStage
        from tantivy_ray.search.query import NumericRangeQuery, count_query

        # encode events.value (f64) into a term field and range-count
        src = "/root/testdata/sf0.001/events.parquet"
        ds = rd.read_parquet(src, columns=["event_id", "value"])
        enc = ds.map_batches(EncodeNumericStage("value", kind="f64"),
                             batch_format="pyarrow")
        out = str(tmp_path / "events_enc.parquet")
        pa_tbl = pa.Table.from_pandas(enc.to_pandas(), preserve_index=False)
        pa_tbl = pa_tbl.sort_by("event_id").append_column(
            "dummy_text", pa.array([""] * len(pa_tbl)))
        import pyarrow.parquet as pq

        pq.write_table(pa_tbl, out)
        idx = str(tmp_path / "ix")
        build_index(out, idx, text_col="dummy_text", id_col="event_id",
                    docs_per_segment=400,
                    extra_text_fields={"value_enc": "raw"})
        from tantivy_ray.search import IndexSearcher

        s = IndexSearcher(idx)
        q = NumericRangeQuery("value_enc", 5.0, 20.0, kind="f64")
        got = count_query(s.readers, q, s.total_num_docs,
                          s.average_fieldnorm, s.doc_freq)
        import pyarrow.parquet as pq2

        vals = pq2.read_table(src, columns=["value"]).column("value").to_numpy()
        assert got == int(((vals >= 5.0) & (vals < 20.0)).sum())
        # inclusive upper
        q2 = NumericRangeQuery("value_enc", 5.0, 20.0, kind="f64",
                               include_upper=True)
        got2 = count_query(s.readers, q2, s.total_num_docs,
                           s.average_fieldnorm, s.doc_freq)
        assert got2 == int(((vals >= 5.0) & (vals <= 20.0)).sum())
