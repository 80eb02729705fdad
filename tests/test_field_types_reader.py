"""Bytes / IpAddr / Bool field encodings (reference
src/schema/field_type.rs:170-192) and IndexReader reload policies
(reference src/reader/mod.rs:21-53)."""

import ipaddress
import random
import time

import pyarrow as pa
import pytest

from tantivy_ray.index.numeric import (
    decode_bool,
    decode_bytes,
    decode_ip,
    encode_bool,
    encode_bytes,
    encode_ip,
)


class TestFieldEncodings:
    def test_bytes_roundtrip_and_order(self):
        rnd = random.Random(3)
        vals = [bytes(rnd.randrange(256) for _ in range(rnd.randrange(12)))
                for _ in range(300)]
        for v in vals:
            assert decode_bytes(encode_bytes(v)) == v
        enc = [encode_bytes(v) for v in vals]
        assert sorted(enc) == [encode_bytes(v) for v in sorted(vals)]

    def test_ip_roundtrip_and_order(self):
        vals = ["0.0.0.0", "10.1.2.3", "10.1.2.4", "192.168.0.1",
                "255.255.255.255", "::1", "2001:db8::1", "fe80::1",
                "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"]
        addrs = [ipaddress.ip_address(v) for v in vals]
        for a in addrs:
            d = decode_ip(encode_ip(a))
            assert ipaddress.ip_address(str(d)) == (
                a if a.version == 6 else ipaddress.ip_address(str(a)))
        # order: every address as its u128 (v4 mapped into v6)

        def as_u128(a):
            if a.version == 4:
                a = ipaddress.IPv6Address("::ffff:" + str(a))
            return int(a)

        enc = [encode_ip(a) for a in addrs]
        order = sorted(range(len(addrs)), key=lambda i: as_u128(addrs[i]))
        assert sorted(enc) == [enc[i] for i in order]

    def test_bool(self):
        assert encode_bool(False) < encode_bool(True)
        assert decode_bool(encode_bool(True)) is True

    def test_range_query_over_ip_terms(self, tmp_path):
        from tantivy_ray.index.manifest import IndexManifest, write_manifest
        from tantivy_ray.index.segment import build_segment_from_table
        from tantivy_ray.search import IndexSearcher
        from tantivy_ray.search.query import NumericRangeQuery, count_query

        ips = ["10.0.0.1", "10.0.0.5", "10.0.1.1", "192.168.1.1", "::1"]
        t = pa.table({
            "url": [f"d{i}" for i in range(len(ips))],
            "text": [encode_ip(ip) for ip in ips],
        })
        meta = build_segment_from_table(t, 0, str(tmp_path),
                                        analyzer="whitespace")
        write_manifest(str(tmp_path), IndexManifest(segments=[meta]))
        s = IndexSearcher(str(tmp_path))
        q = NumericRangeQuery(None, kind="ip", lower="10.0.0.0",
                              upper="10.0.255.255", include_upper=True)
        n = count_query(s.readers, q, s.total_num_docs,
                        s.average_fieldnorm, s.doc_freq)
        assert n == 3


@pytest.mark.usefixtures("ray_session")
class TestReloadPolicy:
    def _write_docs(self, writer, texts):
        for i, t in enumerate(texts):
            writer.add_document({"url": f"x{i}-{t[:4]}", "text": t})

    def test_on_commit_with_delay_sees_new_commit(self, tmp_path):
        from tantivy_ray.search import IndexReader, ReloadPolicy
        from tantivy_ray.sources.writer import IndexWriter

        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        self._write_docs(w, ["alpha beta", "gamma delta"])
        w.commit()

        r = IndexReader(str(tmp_path),
                        reload_policy=ReloadPolicy.ON_COMMIT_WITH_DELAY,
                        delay_secs=0.05)
        assert r.searcher().total_num_docs == 2

        self._write_docs(w, ["epsilon zeta"])
        w.commit()
        time.sleep(0.1)
        assert r.searcher().total_num_docs == 3  # auto-reloaded

    def test_manual_requires_reload(self, tmp_path):
        from tantivy_ray.search import IndexReader, ReloadPolicy
        from tantivy_ray.sources.writer import IndexWriter

        w = IndexWriter(str(tmp_path), docs_per_segment=10)
        self._write_docs(w, ["alpha beta"])
        w.commit()
        r = IndexReader(str(tmp_path), reload_policy=ReloadPolicy.MANUAL)
        assert r.searcher().total_num_docs == 1
        self._write_docs(w, ["gamma delta"])
        w.commit()
        time.sleep(0.05)
        assert r.searcher().total_num_docs == 1   # snapshot unchanged
        r.reload()
        assert r.searcher().total_num_docs == 2


@pytest.mark.usefixtures("ray_session")
class TestReloadWithCompaction:
    def test_reader_sees_compacted_index(self, tmp_path):
        """IndexReader(OnCommitWithDelay) + compaction compose: after the
        compactor swaps segments and republishes the manifest, the
        reader auto-reloads and serves identical results."""
        from tantivy_ray.index.compaction import LogMergePolicy, compact
        from tantivy_ray.search import IndexReader, ReloadPolicy
        from tantivy_ray.sources.writer import IndexWriter

        # compaction re-analyzes from the stored text fast field
        w = IndexWriter(str(tmp_path), docs_per_segment=4,
                        fast_fields=["text"])
        texts = [f"alpha beta doc{i} gamma" for i in range(20)]
        for i, t in enumerate(texts):
            w.add_document({"url": f"u{i}", "text": t})
        w.commit()

        r = IndexReader(str(tmp_path),
                        reload_policy=ReloadPolicy.ON_COMMIT_WITH_DELAY,
                        delay_secs=0.05)
        before = r.searcher().search(["alpha", "beta"], "and", 20)
        n_seg_before = len(r.searcher().readers)
        assert n_seg_before == 5

        res = compact(str(tmp_path),
                      LogMergePolicy(min_num_segments=3, min_layer_size=2))
        assert len(res["merged_groups"]) >= 1
        time.sleep(0.1)
        after_s = r.searcher()
        assert len(after_s.readers) < n_seg_before  # reloaded snapshot
        after = after_s.search(["alpha", "beta"], "and", 20)
        # identical result set through the swap: compaction preserves
        # global stats, so the f32 scores match exactly
        import numpy as np

        assert len(after) == len(before) == 20
        before_scores = sorted(np.float32(sc) for sc, _, _ in before)
        after_scores = sorted(np.float32(sc) for sc, _, _ in after)
        assert before_scores == after_scores
