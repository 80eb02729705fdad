"""Ray Data index build pipeline: multi-segment build over real testdata,
deterministic partitioning, resume-from-checkpoint (manifest-diff test,
BASELINE.md resumability criterion)."""

import os
import shutil

import pytest

from tantivy_ray.index import (
    build_index,
    load_manifest,
    plan_partitions,
)
from tantivy_ray.search import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestPlan:
    def test_deterministic_and_splits(self):
        p1 = plan_partitions([DOCS], docs_per_segment=150)
        p2 = plan_partitions([DOCS], docs_per_segment=150)
        assert p1 == p2
        assert sum(p["num_rows"] for p in p1) == 500
        assert all(p["num_rows"] <= 150 for p in p1)
        assert [p["segment_ord"] for p in p1] == list(range(len(p1)))


@pytest.mark.usefixtures("ray_session")
class TestBuildPipeline:
    def test_build_search_resume(self, tmp_path):
        idx = str(tmp_path / "ix")
        m = build_index(
            DOCS, idx, text_col="text", id_col="doc_id",
            docs_per_segment=150,
        )
        assert m.total_num_docs == 500
        assert len(m.segments) == 4  # 150+150+150+50
        assert m.total_num_tokens > 0

        s = IndexSearcher(idx)
        hits = s.search(["table", "merge"], "or", 10)
        assert len(hits) == 10
        assert hits[0][0] >= hits[-1][0]

        # resume: remove one segment, rebuild → only that one is rebuilt
        target = os.path.join(idx, "seg-00002")
        kept = os.path.join(idx, "seg-00001", "meta.json")
        mtime_before = os.path.getmtime(kept)
        shutil.rmtree(target)
        m2 = build_index(
            DOCS, idx, text_col="text", id_col="doc_id",
            docs_per_segment=150,
        )
        assert os.path.exists(os.path.join(target, "meta.json"))
        assert os.path.getmtime(kept) == mtime_before  # untouched
        assert m2.total_num_docs == 500
        # identical results after resume
        s2 = IndexSearcher(idx)
        assert s2.search(["table", "merge"], "or", 10) == hits

    def test_deterministic_across_builds(self, tmp_path):
        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        build_index(DOCS, a, id_col="doc_id", docs_per_segment=200)
        build_index(DOCS, b, id_col="doc_id", docs_per_segment=200)
        sa, sb = IndexSearcher(a), IndexSearcher(b)
        q = ["spark", "window", "group"]
        assert sa.search(q, "or", 20) == sb.search(q, "or", 20)
        with open(os.path.join(a, "seg-00000", "postings.bin"), "rb") as f:
            pa_bytes = f.read()
        with open(os.path.join(b, "seg-00000", "postings.bin"), "rb") as f:
            pb_bytes = f.read()
        assert pa_bytes == pb_bytes  # byte-identical segments
