"""Brute-force cosine top-k — the exact ANN baseline.

Scale shape: the query matrix is broadcast once (ray.put); every batch
computes a (nq x batch) cosine matmul and emits per-batch top-k partials;
a tiny groupby-reduce merges them.  Work is one pass over the corpus per
query batch — the IVF variant (ivf.py) is the sublinear path."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..utils import remote_args


def brute_force_cosine_topk(ds, query_ids: np.ndarray, query_mat: np.ndarray,
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exclude_ids: Optional[set] = None) -> pa.Table:
    """→ (query_vec_id, rank, vec_id, cos) exact top-k per query."""
    import ray

    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))
    excl = frozenset(int(x) for x in (exclude_ids or ()))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qids, qmat = _ray.get(qref)
        vids = batch.column(id_col).to_numpy()
        keep = ~np.isin(vids, np.array(sorted(excl), dtype=vids.dtype)) \
            if excl else np.ones(len(vids), dtype=bool)
        if not keep.any():
            return pa.table({"query_vec_id": pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64()),
                             "vec_id": pa.array([], type=pa.int64())})
        flat = batch.column(vec_col).combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        dim = qmat.shape[1]
        m = flat.astype(np.float64).reshape(len(vids), dim)[keep]
        vids = vids[keep]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = qmat @ mn.T
        top = min(k, cos.shape[1])
        rows = {"query_vec_id": [], "cos": [], "vec_id": []}
        for qi in range(len(qids)):
            idx = (np.argpartition(-cos[qi], top - 1)[:top]
                   if cos.shape[1] > top else np.arange(cos.shape[1]))
            rows["query_vec_id"].extend([int(qids[qi])] * len(idx))
            rows["cos"].extend(cos[qi, idx].tolist())
            rows["vec_id"].extend(vids[idx].tolist())
        return pa.table({
            "query_vec_id": pa.array(rows["query_vec_id"], type=pa.int64()),
            "cos": pa.array(rows["cos"], type=pa.float64()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", **remote_args())

    def reduce_q(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_vec_id": g["query_vec_id"].astype("int64"),
            "rank": pd.Series(np.arange(len(g)), dtype="int64"),
            "vec_id": g["vec_id"].astype("int64"),
            "cos": g["cos"].astype("float64"),
        })

    out = partials.groupby("query_vec_id").map_groups(
        reduce_q, batch_format="pandas", **remote_args()
    ).to_pandas().sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
