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

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analyzer import analyze_batch
from ..utils import remote_args


class SimHasher:
    def __init__(self, nbits: int = 64, shingle_w: int = 3):
        assert nbits == 64
        self.nbits = 64
        self.shingle_w = shingle_w

    @staticmethod
    def _feature_hashes(feats: List[str]) -> np.ndarray:
        return np.array(
            [int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
             for t in feats],
            dtype=np.uint64,
        )

    def features(self, tokens: List[str]) -> List[str]:
        w = self.shingle_w
        if len(tokens) < w:
            return [" ".join(tokens)] if tokens else []
        return sorted({" ".join(tokens[i:i + w])
                       for i in range(len(tokens) - w + 1)})

    def fingerprint(self, tokens: List[str]) -> int:
        feats = self.features(tokens)
        if not feats:
            return 0
        h = self._feature_hashes(feats)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = np.where(bits == 1, 1, -1).sum(axis=0)
        fp = 0
        for i in range(64):
            if v[i] > 0:
                fp |= (1 << i)
        return fp


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
        ids = batch.column(id_col).to_pylist()
        rows = {"band_key": [], id_col: [], "fp": []}
        for i, toks in enumerate(out.tokens.to_pylist()):
            if not toks:
                continue
            fp = hasher.fingerprint(toks)
            for b in range(n_bands):
                part = (fp >> (b * band_bits)) & ((1 << band_bits) - 1)
                rows["band_key"].append(f"{b}:{part:x}")
                rows[id_col].append(int(ids[i]))
                rows["fp"].append(fp)
        return pa.table({
            "band_key": pa.array(rows["band_key"]),
            id_col: pa.array(rows[id_col], type=pa.int64()),
            "fp": pa.array(rows["fp"], type=pa.uint64()),
        })

    banded = ds.map_batches(stage, batch_format="pyarrow", **remote_args())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        items = sorted({(int(i), int(f)) for i, f in zip(g[id_col], g["fp"])})
        a, b, d = [], [], []
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                dist = hamming(items[x][1], items[y][1])
                if dist <= max_distance:
                    a.append(items[x][0]); b.append(items[y][0]); d.append(dist)
        return pd.DataFrame({"id_a": a, "id_b": b, "distance": d})

    pairs = banded.groupby("band_key").map_groups(
        bucket_pairs, batch_format="pandas", **remote_args()
    ).to_pandas().drop_duplicates(ignore_index=True)
    pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        pairs.astype({"id_a": "int64", "id_b": "int64", "distance": "int64"}),
        preserve_index=False,
    )
