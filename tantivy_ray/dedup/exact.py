"""Exact dedup — hash-partition + keep-first (SURVEY §2.7).

Scale shape: a content hash is computed vectorized per batch; the groupby
shuffles only (hash, id) pairs — never the payload — and keep-first picks
the smallest id per hash group deterministically."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..utils import remote_args


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of (id_col) rows to KEEP (first id per distinct content)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.sha256((t or "").encode()).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table({
            id_col: batch.column(id_col),
            "content_hash": pa.array(h, type=pa.string()),
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", **remote_args())

    # keep-first = Min per hash via the vectorized aggregate (with
    # per-block partial combine) — a per-group map_groups would pay
    # python/pandas overhead on every unique document at corpus scale
    from ray.data.aggregate import Min

    return (hashed.groupby("content_hash")
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col]))
