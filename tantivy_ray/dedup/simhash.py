"""SimHash near-duplicate detection.

64-bit simhash over token 3-gram SHINGLE features (weight 1 each): each
feature's blake2b-64 hash contributes ±1 per bit; the sign of each bit-sum
is the fingerprint bit.  Shingles (not unigram tfs) keep the feature set
sparse and near-unique, so a few edited tokens move only a few of ~n
contributions per bit — expected Hamming distance ≈ 64·θ/π where θ is the
angle between feature sets (jaccard 0.95 ⇒ ≈4-5 bits).  Near-dups = pairs
with Hamming distance <= k.  Candidate generation uses (k+1) bit-bands:
two fingerprints within distance k share at least one identical band
(pigeonhole), so banding is RECALL-EXACT for the distance threshold —
unlike MinHash banding there is no probabilistic miss.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..analyzer import analyze_batch
from ..utils import remote_args
from .hashing import hash_strings64


class SimHasher:
    def __init__(self, nbits: int = 64, shingle_w: int = 3):
        assert nbits == 64
        self.nbits = 64
        self.shingle_w = shingle_w

    _feature_hashes = staticmethod(hash_strings64)

    def features(self, tokens: List[str]) -> List[str]:
        w = self.shingle_w
        if len(tokens) < w:
            return [" ".join(tokens)] if tokens else []
        return sorted({" ".join(tokens[i:i + w])
                       for i in range(len(tokens) - w + 1)})

    def fingerprints_batch(self, token_lists: List[List[str]]) -> np.ndarray:
        """(D,) uint64 fingerprints, vectorized across the whole batch:
        one C-speed hash over all features + per-doc bit-sums via
        integer ``np.add.reduceat`` over contiguous feature runs."""
        all_feats: List[str] = []
        starts = np.empty(len(token_lists), dtype=np.int64)
        counts = np.empty(len(token_lists), dtype=np.int64)
        for i, toks in enumerate(token_lists):
            f = self.features(toks)
            starts[i] = len(all_feats)
            counts[i] = len(f)
            all_feats.extend(f)
        out = np.zeros(len(token_lists), dtype=np.uint64)
        if not all_feats:
            return out
        h = hash_strings64(all_feats)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                ).astype(np.int64)                       # (S, 64)
        nonempty = np.flatnonzero(counts > 0)
        if len(nonempty) == 0:
            return out
        ones = np.add.reduceat(bits, starts[nonempty], axis=0)  # (D', 64)
        # ±1 votes: bit set iff ones > count/2 (ties → 0, matching the
        # strict `v > 0` sign rule: 2*ones - count > 0)
        pos = (2 * ones) > counts[nonempty][:, None]
        weights = np.left_shift(np.uint64(1),
                                np.arange(64, dtype=np.uint64))
        out[nonempty] = (pos.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return out

    def fingerprint(self, tokens: List[str]) -> int:
        return int(self.fingerprints_batch([tokens])[0])


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_pairs(ds, text_col="text", id_col="doc_id",
                  max_distance: int = 10, analyzer: str = "default") -> pa.Table:
    """→ (id_a, id_b, distance) pairs with Hamming distance <= max_distance."""
    hasher = SimHasher()
    n_bands = max_distance + 1
    band_bits = 64 // n_bands

    def stage(batch: pa.Table) -> pa.Table:
        out = analyze_batch(batch.column(text_col), analyzer)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        token_lists = out.tokens.to_pylist()
        nonempty = np.array([bool(t) for t in token_lists], dtype=bool)
        idx = np.flatnonzero(nonempty)
        if len(idx) == 0:
            return pa.table({"band_key": pa.array([], type=pa.uint64()),
                             id_col: pa.array([], type=pa.int64()),
                             "fp": pa.array([], type=pa.uint64())})
        fps = hasher.fingerprints_batch([token_lists[i] for i in idx])
        # vectorized banding: band b's bits, keyed with the band index
        mask = np.uint64((1 << band_bits) - 1)
        parts = np.stack([
            (fps >> np.uint64(b * band_bits)) & mask for b in range(n_bands)
        ], axis=1)                                    # (D, n_bands)
        band_ids = np.arange(n_bands, dtype=np.uint64)[None, :]
        keys = parts | (band_ids << np.uint64(band_bits))
        return pa.table({
            "band_key": pa.array(keys.ravel(), type=pa.uint64()),
            id_col: pa.array(np.repeat(ids[idx], n_bands), type=pa.int64()),
            "fp": pa.array(np.repeat(fps, n_bands), type=pa.uint64()),
        })

    banded = ds.map_batches(stage, batch_format="pyarrow", **remote_args())

    def bucket_pairs_block(tbl: pa.Table) -> pa.Table:
        """All buckets in one band_key-sorted block; singleton buckets
        (the vast majority) skipped vectorized."""
        n = tbl.num_rows
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "distance": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        k = tbl.column("band_key").to_numpy()
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        multi = (ends - starts) >= 2
        if not multi.any():
            return empty
        ids_np = tbl.column(id_col).to_numpy()
        fps_np = tbl.column("fp").to_numpy()
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts[multi], ends[multi]):
            items = sorted({(int(i), int(f))
                            for i, f in zip(ids_np[s:e], fps_np[s:e])})
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    dist = hamming(items[x][1], items[y][1])
                    if dist <= max_distance:
                        a_out.append(items[x][0])
                        b_out.append(items[y][0])
                        d_out.append(dist)
        return pa.table({
            "id_a": pa.array(a_out, type=pa.int64()),
            "id_b": pa.array(b_out, type=pa.int64()),
            "distance": pa.array(d_out, type=pa.int64()),
        })

    pairs = banded.sort("band_key").map_batches(
        bucket_pairs_block, batch_size=None, batch_format="pyarrow",
        **remote_args(),
    ).to_pandas().drop_duplicates(ignore_index=True)
    pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        pairs.astype({"id_a": "int64", "id_b": "int64", "distance": "int64"}),
        preserve_index=False,
    )
