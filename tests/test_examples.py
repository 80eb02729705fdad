"""Every examples/ script runs green as a real subprocess (the
reference ships runnable examples/; these mirror its topics)."""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

LIGHT = ["basic_search.py", "analyzers.py", "fuzzy_and_prefix.py",
         "dates_numbers_ips.py", "iterating_docs_and_positions.py",
         "custom_collector.py", "faceted_search.py",
         "json_and_snippets.py"]
RAY = ["aggregation.py", "distributed_build.py",
       "deleting_updating_documents.py", "warmed_searcher_pool.py",
       "corpus_dedup.py"]


def _run(name):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(EXAMPLES_DIR)
    res = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, name)],
        capture_output=True, text=True, cwd="/tmp", env=env, timeout=240,
    )
    assert res.returncode == 0, f"{name}: {res.stderr[-2000:]}"


@pytest.mark.parametrize("name", LIGHT)
def test_light_examples(name):
    _run(name)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", RAY)
def test_ray_examples(name):
    _run(name)
