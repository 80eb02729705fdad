"""IVF (inverted-file) approximate nearest neighbor — the scale path.

Classic IVF-Flat: k-means coarse quantizer (seeded, deterministic Lloyd
iterations on a BOUNDED sample), vectors partitioned by nearest
centroid, queries probe only the ``nprobe`` nearest lists.

Scale shape:
  * training reads only a bounded sample (``random_sample`` + ``limit``)
    — never the full corpus — to the driver;
  * the assignment pass is one ``map_batches`` with the centroid matrix
    broadcast via ``ray.put`` (fetched zero-copy per task);
  * the assigned corpus is written as CENTROID-PARTITIONED parquet
    (``centroid=<c>/`` directories), so a probe reads only its
    ``nprobe`` partitions from storage — the same pruning idea as the
    term-partitioned merge output;
  * probed lists are decoded once and cached per process (searchers are
    long-lived actors in a serving pool).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..utils import remote_args

DEFAULT_TRAIN_MAX = 50_000


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
    """Cosine IVF-Flat over centroid-partitioned parquet storage."""

    def __init__(self, centroids: np.ndarray, storage_dir: str,
                 id_col: str, vec_col: str):
        self.centroids = centroids   # (k, dim), unit norm
        self.storage_dir = storage_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self._list_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    @classmethod
    def build(cls, ds, storage_dir: str, n_lists: int = 16,
              train_iters: int = 5, seed: int = 11,
              id_col: str = "vec_id", vec_col: str = "embedding",
              train_max: int = DEFAULT_TRAIN_MAX) -> "IvfIndex":
        import ray

        # bounded training sample: estimate the fraction from row count,
        # hard-cap with limit() — the full corpus never reaches the driver
        n = ds.count()
        frac = min(1.0, (train_max * 1.25) / max(1, n))
        sample_ds = (ds.random_sample(frac, seed=seed) if frac < 1.0
                     else ds).limit(train_max)
        st = sample_ds.to_pandas()
        sm = np.stack([np.asarray(v, dtype=np.float64) for v in st[vec_col]])
        norms = np.linalg.norm(sm, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sm = sm / norms
        centroids = _kmeans(sm, n_lists, train_iters, seed)
        cref = ray.put(centroids)

        def assign(batch: pa.Table) -> pa.Table:
            import ray as _ray

            cent = _ray.get(cref)
            vids = batch.column(id_col).to_numpy()
            flat = batch.column(vec_col).combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False)
            m = flat.astype(np.float64).reshape(len(vids), cent.shape[1])
            nn = np.linalg.norm(m, axis=1, keepdims=True)
            nn[nn == 0] = 1.0
            mn = m / nn
            a = np.argmax(mn @ cent.T, axis=1).astype(np.int32)
            return pa.table({
                id_col: pa.array(vids.astype(np.int64)),
                "centroid": pa.array(a),
                vec_col: pa.array(list(mn), type=pa.list_(pa.float64())),
            })

        shutil.rmtree(storage_dir, ignore_errors=True)
        (ds.map_batches(assign, batch_format="pyarrow", **remote_args())
           .write_parquet(storage_dir, partition_cols=["centroid"]))
        np.save(os.path.join(storage_dir, "centroids.npy"), centroids)
        return cls(centroids, storage_dir, id_col, vec_col)

    @classmethod
    def open(cls, storage_dir: str, id_col: str = "vec_id",
             vec_col: str = "embedding") -> "IvfIndex":
        centroids = np.load(os.path.join(storage_dir, "centroids.npy"))
        return cls(centroids, storage_dir, id_col, vec_col)

    def _list(self, c: int) -> Tuple[np.ndarray, np.ndarray]:
        """(ids, unit vectors) of one centroid partition (cached)."""
        hit = self._list_cache.get(c)
        if hit is not None:
            return hit
        part = os.path.join(self.storage_dir, f"centroid={c}")
        if not os.path.isdir(part):
            out = (np.empty(0, dtype=np.int64), np.empty((0, 1)))
        else:
            import pyarrow.dataset as pads

            t = pads.dataset(part).to_table()
            ids = t.column(self.id_col).to_numpy().astype(np.int64)
            flat = t.column(self.vec_col).combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False)
            m = flat.astype(np.float64).reshape(len(ids), -1)
            out = (ids, m)
        self._list_cache[c] = out
        return out

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4,
               exclude: Optional[set] = None):
        """→ list of (cos, vec_id) ordered (cos desc, id asc); reads only
        the ``nprobe`` probed centroid partitions."""
        q = np.asarray(query, dtype=np.float64)
        q = q / np.linalg.norm(q)
        order = np.argsort(-(self.centroids @ q))[:nprobe]
        cands_id, cands_cos = [], []
        for c in order:
            ids, vecs = self._list(int(c))
            if len(ids) == 0:
                continue
            cands_id.append(ids)
            cands_cos.append(vecs @ q)
        if not cands_id:
            return []
        ids = np.concatenate(cands_id)
        cos = np.concatenate(cands_cos)
        if exclude:
            keep = ~np.isin(ids, np.array(sorted(exclude), dtype=np.int64))
            ids, cos = ids[keep], cos[keep]
        sel = np.lexsort((ids, -cos))[:k]
        return [(float(cos[i]), int(ids[i])) for i in sel]
