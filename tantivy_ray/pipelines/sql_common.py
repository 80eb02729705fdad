"""Shared SQL fragments + cached-index helpers used by all query
modules (extracted to break import cycles)."""

from __future__ import annotations

import hashlib
import os
from typing import List

from ..analyzer import ENGLISH_STOP_WORDS
from ..fieldnorm import FIELD_NORMS_TABLE

# default-analyzer tokens of documents.text as a DuckDB list expression
TOKENS_EXPR = (
    "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), "
    "x -> x <> '' AND strlen(x) < 40)"
)

TOK_CTE = (
    "tok AS (SELECT doc_id, t.term FROM documents, "
    f"unnest({TOKENS_EXPR}) AS t(term))"
)

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

FNTAB_SQL = "fntab(v) AS (VALUES " + ", ".join(
    f"({int(v)})" for v in FIELD_NORMS_TABLE
) + ")"

# Reference query set over the documents corpus vocabulary
DOC_QUERIES: List[tuple] = [
    (0, ["data", "fast"], "or", 10),
    (1, ["merge"], "or", 10),
    (2, ["table", "scan", "filter"], "or", 15),
    (3, ["window", "batch"], "and", 10),
    (4, ["spark", "stream", "vector"], "or", 10),
    (5, ["customer", "nosuchterm"], "or", 10),
    (6, ["nosuchterm"], "or", 5),
    (7, ["key", "value"], "and", 12),
    (8, ["dup"], "or", 25),
    (9, ["the", "a"], "or", 20),
]


def _index_cache_dir(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join("/tmp/tantivy_ray_cache", f"docs_ix_{tag}")


def build_docs_index(sf_dir: str, docs_per_segment: int = 2000) -> str:
    """Build (resume-aware, cached) the documents full-text index."""
    from ..index.build import build_index

    idx = _index_cache_dir(sf_dir)
    manifest_path = os.path.join(idx, "manifest.json")
    if not os.path.exists(manifest_path):
        build_index(
            os.path.join(sf_dir, "documents.parquet"), idx,
            text_col="text", id_col="doc_id",
            docs_per_segment=docs_per_segment,
        )
    return idx
