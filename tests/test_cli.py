"""CLI entry points (python -m tantivy_ray): build → search → merge →
compact, driven as real subprocesses from outside the repo directory."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def run_cli(*args, cwd="/tmp"):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "tantivy_ray", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=240,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return [json.loads(line) for line in res.stdout.strip().splitlines()
            if line.strip()]


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_build_search_merge_compact(self, tmp_path):
        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.table({
            "url": [f"u{i}" for i in range(60)],
            "text": [f"alpha beta doc{i} gamma" for i in range(60)],
        }), src)
        ix = str(tmp_path / "ix")

        out = run_cli("build", "--input", src, "--index", ix,
                      "--docs-per-segment", "20", "--store-text")
        assert out[0]["total_num_docs"] == 60 and out[0]["segments"] == 3

        hits = run_cli("search", "--index", ix,
                       "--query", "alpha AND doc7", "-k", "3")
        assert hits[0]["doc"] == "u7" and hits[0]["rank"] == 0

        merged = str(tmp_path / "merged")
        out = run_cli("merge", "--index", ix, "--out", merged)
        assert out[0]["total_num_docs"] == 60

        out = run_cli("compact", "--index", ix, "--min-segments", "2")
        assert out[0]["merged_groups"] >= 1
        # post-compaction search still answers
        hits = run_cli("search", "--index", ix,
                       "--query", "gamma", "-k", "1")
        assert len(hits) == 1
