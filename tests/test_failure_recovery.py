"""Failure injection: a build task that crashes on its first attempt must
be retried by Ray and produce a byte-identical index (reference failpoint
tests, tests/failpoints/; determinism guarantee SURVEY §7.4.4)."""

import os

import pytest

from tantivy_ray.index import build_index
from tantivy_ray.search import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.mark.usefixtures("ray_session")
def test_injected_failure_retries_to_identical_index(tmp_path):
    ref = str(tmp_path / "ref")
    build_index(DOCS, ref, id_col="doc_id", docs_per_segment=150)

    flaky = str(tmp_path / "flaky")
    os.makedirs(flaky)
    fp = os.path.join(flaky, ".failpoint_once_1")
    open(fp, "w").close()
    m = build_index(DOCS, flaky, id_col="doc_id", docs_per_segment=150)
    assert m.total_num_docs == 500
    assert not os.path.exists(fp)  # failpoint consumed → one failure happened

    # byte-identical segments despite the retry
    for seg in ("seg-00000", "seg-00001", "seg-00002", "seg-00003"):
        with open(os.path.join(ref, seg, "postings.bin"), "rb") as f:
            a = f.read()
        with open(os.path.join(flaky, seg, "postings.bin"), "rb") as f:
            b = f.read()
        assert a == b, seg
    sa, sb = IndexSearcher(ref), IndexSearcher(flaky)
    q = ["table", "merge", "window"]
    assert sa.search(q, "or", 15) == sb.search(q, "or", 15)
