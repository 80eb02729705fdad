"""Embedding cosine near-duplicate pairs — distributed.

Default (``method="block_exact"``): EXACT all-pairs cosine, computed as
a block-wise upper-triangular matmul sweep.  Vectors are normalized in
``map_batches``, the normalized blocks stay in the Ray object store, and
one task per block pair (i <= j) computes the in/cross-block products —
the driver only ever holds block REFERENCES and the (small) verified
pair table.  O(N²/B) FLOPs total, spread over B(B+1)/2 tasks; exact, so
it matches the brute-force SQL oracle.

``method="lsh"``: random-hyperplane sign-bucketing via a ``groupby``;
only same-bucket pairs are compared.  Approximate (recall → 1 as
threshold → 1) but linear shuffle volume — the 100-TB path.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from ..utils import remote_args


def _normalize_stage(vec_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch.column(vec_col).to_pylist()])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            vec_col: pa.array(list(mn), type=pa.list_(pa.float64())),
        })

    return fn


def _block_pairs_task(ids_a, m_a, ids_b, m_b, same: bool,
                      threshold: float) -> List[Tuple[int, int, float]]:
    cos = m_a @ m_b.T
    if same:
        iu, ju = np.triu_indices(len(ids_a), k=1)
    else:
        iu, ju = np.meshgrid(np.arange(len(ids_a)), np.arange(len(ids_b)),
                             indexing="ij")
        iu, ju = iu.ravel(), ju.ravel()
    vals = cos[iu, ju]
    mask = vals >= threshold
    rows = []
    for i, j, c in zip(iu[mask], ju[mask], vals[mask]):
        a, b = sorted((int(ids_a[i]), int(ids_b[j])))
        rows.append((a, b, float(c)))
    return rows


def _pairs_table(rows: List[Tuple[int, int, float]]) -> pa.Table:
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "id_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "cos": pa.array([round(r[2], 6) for r in rows], type=pa.float64()),
    })


def embedding_near_dup_pairs(ds, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.9,
                             lsh_bits: int = 0,
                             seed: int = 13,
                             target_block_rows: int = 4096) -> pa.Table:
    """→ (id_a, id_b, cos) pairs with cosine >= threshold (id_a < id_b).

    lsh_bits=0 → distributed exact block sweep; lsh_bits>0 → random-
    hyperplane bucketing, only same-bucket pairs compared."""
    import ray

    if lsh_bits > 0:
        return _lsh_pairs(ds, id_col, vec_col, threshold, lsh_bits, seed)

    normalized = ds.map_batches(_normalize_stage(vec_col, id_col),
                                batch_format="pyarrow",
                                **remote_args()).materialize()
    # materialized once: count() is then free metadata, and the
    # repartition below does not re-run the normalize
    n = normalized.count()
    n_blocks = max(1, -(-n // target_block_rows))
    blocks = normalized.repartition(n_blocks).materialize()

    @ray.remote
    def to_matrix(tbl: pa.Table):
        ids = tbl.column(id_col).to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in tbl.column(vec_col).to_pylist()]) \
            if tbl.num_rows else np.zeros((0, 1))
        return ids, m

    @ray.remote
    def pair_task(blk_a, blk_b, same: bool, threshold: float):
        ids_a, m_a = blk_a
        ids_b, m_b = blk_b
        if len(ids_a) == 0 or len(ids_b) == 0:
            return []
        return _block_pairs_task(ids_a, m_a, ids_b, m_b, same, threshold)

    from ..utils import worker_runtime_env

    env = {"runtime_env": worker_runtime_env()}
    block_refs = [ref
                  for bundle in blocks.iter_internal_ref_bundles()
                  for ref in bundle.block_refs]
    mat_refs = [to_matrix.options(**env).remote(r) for r in block_refs]
    tasks = []
    for i in range(len(mat_refs)):
        for j in range(i, len(mat_refs)):
            tasks.append(pair_task.options(**env).remote(
                mat_refs[i], mat_refs[j], i == j, threshold))
    rows: List[Tuple[int, int, float]] = []
    for chunk in ray.get(tasks):
        rows.extend(chunk)
    return _pairs_table(rows)


def _lsh_pairs(ds, id_col: str, vec_col: str, threshold: float,
               lsh_bits: int, seed: int) -> pa.Table:
    """Random-hyperplane sign-bucket LSH: map_batches computes bucket
    codes with a broadcast plane matrix; groupby(bucket) compares only
    within buckets.  Linear shuffle volume — the web-scale path."""
    import pandas as pd

    rs = np.random.RandomState(seed)
    planes: dict = {}

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             vec_col: pa.array([], type=pa.list_(pa.float64()))})
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch.column(vec_col).to_pylist()])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        dim = m.shape[1]
        if dim not in planes:  # deterministic per-dim plane matrix
            planes[dim] = np.random.RandomState(seed).normal(
                size=(dim, lsh_bits))
        codes = ((mn @ planes[dim] > 0)
                 @ (1 << np.arange(lsh_bits, dtype=np.int64)))
        return pa.table({
            "bucket": pa.array(codes, type=pa.int64()),
            id_col: pa.array(ids, type=pa.int64()),
            vec_col: pa.array(list(mn), type=pa.list_(pa.float64())),
        })

    bucketed = ds.map_batches(stage, batch_format="pyarrow",
                              **remote_args())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        ids = g[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        rows = _block_pairs_task(ids, m, ids, m, True, threshold)
        return pd.DataFrame({
            "id_a": [r[0] for r in rows],
            "id_b": [r[1] for r in rows],
            "cos": [round(r[2], 6) for r in rows],
        })

    pdf = (bucketed.groupby("bucket")
           .map_groups(bucket_pairs, batch_format="pandas", **remote_args())
           .to_pandas().drop_duplicates(ignore_index=True))
    rows = [(int(a), int(b), float(c))
            for a, b, c in pdf.itertuples(index=False)]
    return _pairs_table(rows)
