"""Dedup + similarity queries with DuckDB oracles.

minhash_lsh_dups and ngram_jaccard_dups share one oracle (exact shingle-set
jaccard >= 0.8): LSH only prunes candidates and its banding (32x4) has
P(miss | j >= 0.8) < 1e-7, so both engine paths produce the oracle's exact
pair set.  simhash_dups has no SQL expression (rows-only check;
property-tested in tests/).  embedding_near_dups uses the corpus's actual
cosine range (max ~0.51 on the synthetic embeddings)."""

from __future__ import annotations

import os
from typing import Dict

import pyarrow as pa

from ..dedup import (
    embedding_near_dup_pairs,
    jaccard_allpairs_prefix,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .sql_common import TOKENS_EXPR, golden_sql as _golden_sql

JACCARD_THRESHOLD = 0.8
COS_THRESHOLD = 0.45


def _docs(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    path = os.path.join(sf_dir, "documents.parquet")
    # the signature stage is compute-heavy (per-shingle 64-bit mulmod x
    # num_perm), so split into enough blocks to use the CPU allotment —
    # but sort/groupby fixed cost scales with block COUNT, so tiny
    # tables must not be over-split
    n = pq.read_metadata(path).num_rows
    blocks = max(2, min(32, n // 128))
    return rd.read_parquet(path, columns=["doc_id", "text"],
                           override_num_blocks=blocks)


def q_minhash_lsh_dups(sf_dir: str) -> pa.Table:
    return minhash_lsh_pairs(_docs(sf_dir), threshold=JACCARD_THRESHOLD)


def q_ngram_jaccard_dups(sf_dir: str) -> pa.Table:
    """Exact jaccard pairs via the PPJoin-style prefix-filtered all-pairs
    join (dedup/allpairs.py) — lossless and linear-ish, unlike the
    brute-force ngram_jaccard_pairs it replaced (kept as the parity
    reference in tests)."""
    return jaccard_allpairs_prefix(_docs(sf_dir),
                                   threshold=JACCARD_THRESHOLD)


def q_simhash_dups(sf_dir: str) -> pa.Table:
    return simhash_pairs(_docs(sf_dir), max_distance=10)


def q_embedding_near_dups(sf_dir: str) -> pa.Table:
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    # explicit exact sweep: this entry IS the oracle path (auto-selection
    # flips to banded LSH above DEFAULT_EXACT_MAX_ROWS at corpus scale)
    t = embedding_near_dup_pairs(ds, threshold=COS_THRESHOLD,
                                 method="block_exact").to_pandas()
    # DuckDB's list_cosine_similarity runs in float32; round to 3dp on both
    # sides so ~1e-8 precision deltas cannot flip the value hash
    t["cos"] = t["cos"].round(3)
    import pyarrow as _pa

    return _pa.Table.from_pandas(t, preserve_index=False)


SQL_JACCARD_DUPS = f"""
WITH toks AS (SELECT doc_id, {TOKENS_EXPR} AS ts FROM documents),
sh AS (SELECT doc_id,
       list_distinct(list_transform(range(len(ts) - 2),
           i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])) AS s
       FROM toks WHERE len(ts) >= 3)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s)) * 1.0
             / len(list_distinct(a.s || b.s)), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
      / len(list_distinct(a.s || b.s)) >= {JACCARD_THRESHOLD}
"""

SQL_EMBEDDING_NEAR_DUPS = f"""
WITH n AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COS_THRESHOLD}
"""


DEDUP_QUERIES: Dict = {
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "simhash_dups": q_simhash_dups,
    "embedding_near_dups": q_embedding_near_dups,
}

DEDUP_ORACLE_SQL: Dict[str, str] = {
    "minhash_lsh_dups": SQL_JACCARD_DUPS,
    "ngram_jaccard_dups": SQL_JACCARD_DUPS,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    # simhash itself is not SQL-expressible; the oracle is a checked-in
    # golden fixture computed by brute-force all-pairs popcount
    # (tools/make_goldens.py) — independent of the banding under test
    "simhash_dups": _golden_sql("simhash_dups"),
}
