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

# Golden-fixture oracles for deterministic entries DuckDB cannot compute
# itself (no Snowball stemmer / simhash): tools/make_goldens.py derives
# each expected table single-process with logic independent of the
# distributed path (brute-force all-pairs for simhash banding, direct
# Counter df for the index-build path).  The driver's correctness sweep
# runs at sf0.01 — the fixtures are generated at that scale.
_GOLDEN_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "fixtures", "golden", "sf0.01"))


def golden_sql(name: str) -> str:
    return ("SELECT * FROM read_parquet("
            f"'{os.path.join(_GOLDEN_DIR, name)}.parquet')")

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


def _sql_topk_bm25(queries=None) -> str:
    queries = DOC_QUERIES if queries is None else queries
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _, _ in queries for t in terms
    )
    qmeta = ", ".join(
        f"({qid}, {len(terms)}, '{mode}', {k})"
        for qid, terms, mode, k in queries
    )
    return f"""
WITH {TOK_CTE},
{FNTAB_SQL},
doclen AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok) AS n_tokens),
fnorm AS (SELECT d.doc_id,
          (SELECT max(v) FROM fntab WHERE v <= d.n) AS fn FROM doclen d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(query_id, term) AS (VALUES {qvals}),
qmeta(query_id, n_terms, mode, k) AS (VALUES {qmeta}),
scored AS (
  -- the engine scores in float32 (reference src/lib.rs:314); mirror the
  -- quantization by rounding each term contribution and the sum to FLOAT4
  SELECT q.query_id, tf.doc_id,
         CAST(sum(CAST(
             ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * 2.2
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * fnorm.fn
                        / (s.n_tokens * 1.0 / s.n_docs))) AS FLOAT4))
           AS FLOAT4) AS score,
         count(*) AS matched
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN fnorm ON fnorm.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT sc.query_id, sc.doc_id,
         ROW_NUMBER() OVER (PARTITION BY sc.query_id
                            ORDER BY sc.score DESC, sc.doc_id ASC) - 1 AS rank
  FROM scored sc JOIN qmeta m ON m.query_id = sc.query_id
  WHERE m.mode = 'or' OR sc.matched = m.n_terms
)
SELECT r.query_id, r.rank, r.doc_id
FROM ranked r JOIN qmeta m ON m.query_id = r.query_id
WHERE r.rank < m.k
"""
