"""Driver contract for the tantivy_ray graft (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline — full-text index build over
  /root/testdata/sf0.001 documents + BM25 top-k for the reference query
  set, returned as a pyarrow-backed pandas DataFrame.
- queries(): one callable per implemented operator/pipeline (SURVEY §2).
- oracle_sql(): matching DuckDB SQL per query (column names identical).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tantivy_ray  # noqa: E402  (exports PYTHONPATH for Ray workers)
from tantivy_ray.pipelines import queries as q  # noqa: E402


def entry() -> Any:
    """Flagship: build the sf0.001 documents index and run the reference
    query set through the sharded search pipeline."""
    return q.q_topk_bm25("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
