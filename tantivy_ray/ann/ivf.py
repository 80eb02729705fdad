"""IVF (inverted-file) approximate nearest neighbor — the scale path.

Classic IVF-Flat: k-means coarse quantizer (seeded, deterministic Lloyd
iterations on a sample), vectors partitioned by nearest centroid, queries
probe only the ``nprobe`` nearest lists.

Scale shape: training samples via ``ds.random_sample`` (seeded); the
assignment pass is one ``map_batches`` (centroid matrix broadcast with
ray.put); the partitioned corpus is written as centroid-keyed parquet so a
query touches only its probed partitions (same pruning idea as the term-
bucketed merge output).  At test scale the lists are kept in memory.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..utils import remote_args


def _kmeans(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    idx = rs.choice(len(sample), size=min(k, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfIndex:
    """Cosine IVF-Flat over a Dataset of (id, vector) rows."""

    def __init__(self, centroids: np.ndarray, list_ids, list_vecs):
        self.centroids = centroids   # (k, dim), unit norm
        self.list_ids = list_ids     # k arrays of int64
        self.list_vecs = list_vecs   # k arrays (n_i, dim) unit norm

    @classmethod
    def build(cls, ds, n_lists: int = 16, train_iters: int = 5,
              seed: int = 11, id_col: str = "vec_id",
              vec_col: str = "embedding",
              sample_fraction: float = 1.0) -> "IvfIndex":
        import ray

        sample_ds = (ds.random_sample(sample_fraction, seed=seed)
                     if sample_fraction < 1.0 else ds)
        st = sample_ds.to_pandas()
        sm = np.stack([np.asarray(v, dtype=np.float64) for v in st[vec_col]])
        sm = sm / np.linalg.norm(sm, axis=1, keepdims=True)
        centroids = _kmeans(sm, n_lists, train_iters, seed)
        cref = ray.put(centroids)

        def assign(batch: pa.Table) -> pa.Table:
            import ray as _ray

            cent = _ray.get(cref)
            vids = batch.column(id_col).to_numpy()
            flat = batch.column(vec_col).combine_chunks().flatten().to_numpy(
                zero_copy_only=False)
            m = flat.astype(np.float64).reshape(len(vids), cent.shape[1])
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            a = np.argmax(mn @ cent.T, axis=1).astype(np.int32)
            return pa.table({
                id_col: pa.array(vids.astype(np.int64)),
                "centroid": pa.array(a),
                vec_col: batch.column(vec_col),
            })

        assigned = ds.map_batches(assign, batch_format="pyarrow",
                                  **remote_args()).to_pandas()
        k = len(centroids)
        list_ids, list_vecs = [], []
        for c in range(k):
            sub = assigned[assigned["centroid"] == c]
            list_ids.append(sub[id_col].to_numpy(dtype=np.int64))
            if len(sub):
                m = np.stack([np.asarray(v, dtype=np.float64)
                              for v in sub[vec_col]])
                m = m / np.linalg.norm(m, axis=1, keepdims=True)
            else:
                m = np.empty((0, centroids.shape[1]))
            list_vecs.append(m)
        return cls(centroids, list_ids, list_vecs)

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4,
               exclude: Optional[set] = None):
        """→ list of (cos, vec_id) ordered (cos desc, id asc)."""
        q = np.asarray(query, dtype=np.float64)
        q = q / np.linalg.norm(q)
        order = np.argsort(-(self.centroids @ q))[:nprobe]
        cands_id, cands_cos = [], []
        for c in order:
            if len(self.list_ids[c]) == 0:
                continue
            cos = self.list_vecs[c] @ q
            cands_id.append(self.list_ids[c])
            cands_cos.append(cos)
        if not cands_id:
            return []
        ids = np.concatenate(cands_id)
        cos = np.concatenate(cands_cos)
        if exclude:
            keep = ~np.isin(ids, np.array(sorted(exclude), dtype=np.int64))
            ids, cos = ids[keep], cos[keep]
        sel = np.lexsort((ids, -cos))[:k]
        return [(float(cos[i]), int(ids[i])) for i in sel]
