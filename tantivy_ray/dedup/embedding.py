"""Embedding cosine near-duplicate pairs.

Scale shape: normalize embeddings per batch; all-pairs within a batch via
matmul plus cross-batch pairs via a broadcast of previously-seen batches
is quadratic — so for the scale path, bucket by coarse LSH sign-bits first
(random hyperplanes), then all-pairs only within buckets.  At test scale
(<=5k vectors) the dense path below is exact and fast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(ds, id_col: str, vec_col: str):
    tbl = ds.to_pandas()
    ids = tbl[id_col].to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in tbl[vec_col]])
    return ids, m


def embedding_near_dup_pairs(ds, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.9,
                             lsh_bits: int = 0,
                             seed: int = 13) -> pa.Table:
    """→ (id_a, id_b, cos) pairs with cosine >= threshold (id_a < id_b).

    lsh_bits=0 → exact dense all-pairs (test scale).  lsh_bits>0 → random-
    hyperplane bucketing; only same-bucket pairs are compared (approximate;
    recall grows as threshold → 1)."""
    ids, m = _matrix(ds, id_col, vec_col)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms

    rows = []
    if lsh_bits <= 0:
        cos = mn @ mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = cos[iu, ju] >= threshold
        for i, j in zip(iu[mask], ju[mask]):
            a, b = sorted((int(ids[i]), int(ids[j])))
            rows.append((a, b, float(cos[i, j])))
    else:
        rs = np.random.RandomState(seed)
        planes = rs.normal(size=(m.shape[1], lsh_bits))
        codes = (mn @ planes > 0) @ (1 << np.arange(lsh_bits))
        for c in np.unique(codes):
            idx = np.flatnonzero(codes == c)
            if len(idx) < 2:
                continue
            sub = mn[idx] @ mn[idx].T
            iu, ju = np.triu_indices(len(idx), k=1)
            mask = sub[iu, ju] >= threshold
            for i, j in zip(iu[mask], ju[mask]):
                a, b = sorted((int(ids[idx[i]]), int(ids[idx[j]])))
                rows.append((a, b, float(sub[i, j])))
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "id_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "cos": pa.array([round(r[2], 6) for r in rows], type=pa.float64()),
    })
