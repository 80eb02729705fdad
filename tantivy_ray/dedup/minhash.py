"""MinHash + LSH near-duplicate detection.

Pipeline shape (the guide's canonical LSH chain):
    map_batches(shingle → minhash signatures, vectorized)
  → flat_map to (band_id, band_hash, doc_id) rows
  → groupby(band) → candidate pairs within buckets
  → exact-Jaccard verify on the candidates only (second, pruned read)

Shingles are token w-grams (default w=3) of the default analyzer's output;
documents with fewer than w tokens are excluded (their shingle set is
empty — same rule the SQL oracle applies). Signatures use 128 universal-
hash permutations over blake2b-64 shingle hashes; bands default to 32x4 so
P(miss | jaccard >= 0.8) < 1e-7 — effectively exhaustive at the verify
threshold while shuffling only (band_hash, doc_id) pairs at scale.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analyzer import analyze_batch
from ..utils import remote_args

_MERSENNE = (1 << 61) - 1


class MinHasher:
    def __init__(self, num_perm: int = 128, seed: int = 7, shingle_w: int = 3):
        rs = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.shingle_w = shingle_w
        self.a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    @staticmethod
    def shingles(tokens: List[str], w: int) -> List[str]:
        return [" ".join(tokens[i:i + w]) for i in range(len(tokens) - w + 1)]

    @staticmethod
    def _hash64(shingles: List[str]) -> np.ndarray:
        return np.array(
            [int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
             for s in shingles],
            dtype=np.uint64,
        )

    def signature(self, tokens: List[str]) -> Optional[np.ndarray]:
        sh = self.shingles(tokens, self.shingle_w)
        if not sh:
            return None
        x = self._hash64(np.unique(np.array(sh, dtype=object)).tolist())
        # (a*x + b) mod p, computed in python ints via object overflow-free
        # trick: use uint64 modular arithmetic with 128-bit intermediate
        x = x.astype(object)
        vals = (self.a.astype(object)[None, :] * x[:, None]
                + self.b.astype(object)[None, :]) % _MERSENNE
        return np.min(np.array(vals, dtype=np.uint64), axis=0)

    def signatures_batch(self, token_lists: List[List[str]]) -> List[Optional[np.ndarray]]:
        return [self.signature(t) for t in token_lists]


def band_hashes(sig: np.ndarray, bands: int) -> List[int]:
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows].tobytes()
        out.append(int.from_bytes(
            hashlib.blake2b(chunk, digest_size=8).digest(), "big"))
    return out


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_w: int = 3,
    analyzer: str = "default",
) -> pa.Table:
    """→ pa.Table (id_a, id_b, jaccard) for verified near-dup pairs.

    id_a < id_b; jaccard is the EXACT shingle-set jaccard (LSH only
    prunes candidates), so results match a brute-force oracle whenever
    the banding recall covers the threshold."""
    hasher = MinHasher(num_perm, shingle_w=shingle_w)

    def stage_bands(batch: pa.Table) -> pa.Table:
        out = analyze_batch(batch.column(text_col), analyzer)
        ids = batch.column(id_col).to_pylist()
        rows_band: List[int] = []
        rows_hash: List[int] = []
        rows_id: List = []
        for i, toks in enumerate(out.tokens.to_pylist()):
            sig = hasher.signature(toks)
            if sig is None:
                continue
            for b, h in enumerate(band_hashes(sig, bands)):
                rows_band.append(b)
                rows_hash.append(h)
                rows_id.append(ids[i])
        return pa.table({
            "band": pa.array(rows_band, type=pa.int32()),
            "bhash": pa.array(rows_hash, type=pa.uint64()),
            id_col: pa.array(rows_id),
        })

    banded = ds.map_batches(stage_bands, batch_format="pyarrow",
                            **remote_args())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(x) for x in g[id_col]))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    # group on (band, bhash): same-bucket docs are candidates
    banded = banded.map_batches(
        lambda t: t.append_column(
            "bkey",
            pa.array([f"{b}:{h}" for b, h in
                      zip(t.column("band").to_pylist(),
                          t.column("bhash").to_pylist())])),
        batch_format="pyarrow", **remote_args(),
    )
    cand = banded.groupby("bkey").map_groups(
        bucket_pairs, batch_format="pandas", **remote_args()
    )
    cand_pdf = cand.to_pandas().drop_duplicates(ignore_index=True)
    if len(cand_pdf) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})

    # verify: fetch shingle sets for candidate doc ids only
    needed = set(cand_pdf["id_a"]) | set(cand_pdf["id_b"])

    def stage_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keep = [i for i, d in enumerate(ids) if int(d) in needed]
        if not keep:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "shingles": pa.array([], type=pa.list_(pa.string()))})
        sub = batch.take(keep)
        out = analyze_batch(sub.column(text_col), analyzer)
        sh = [sorted(set(MinHasher.shingles(t, shingle_w)))
              for t in out.tokens.to_pylist()]
        return pa.table({
            id_col: sub.column(id_col).cast(pa.int64()),
            "shingles": pa.array(sh, type=pa.list_(pa.string())),
        })

    sh_tbl = ds.map_batches(stage_shingles, batch_format="pyarrow",
                            **remote_args()).to_pandas()
    sh_of: Dict[int, set] = {
        int(r[0]): set(r[1]) for r in sh_tbl.itertuples(index=False)
    }
    rows = []
    for a, b in cand_pdf.itertuples(index=False):
        j = _jaccard(sh_of.get(int(a), set()), sh_of.get(int(b), set()))
        if j >= threshold:
            rows.append((int(a), int(b), j))
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "id_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "jaccard": pa.array([round(r[2], 6) for r in rows], type=pa.float64()),
    })


def ngram_jaccard_pairs(ds, text_col="text", id_col="doc_id",
                        threshold: float = 0.8, shingle_w: int = 3,
                        analyzer: str = "default") -> pa.Table:
    """Brute-force exact shingle-jaccard pairs (the oracle path of
    minhash_lsh_pairs; quadratic — test scale only)."""
    def stage(batch: pa.Table) -> pa.Table:
        out = analyze_batch(batch.column(text_col), analyzer)
        sh = [sorted(set(MinHasher.shingles(t, shingle_w)))
              for t in out.tokens.to_pylist()]
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "shingles": pa.array(sh, type=pa.list_(pa.string())),
        })

    tbl = ds.map_batches(stage, batch_format="pyarrow",
                         **remote_args()).to_pandas()
    ids = tbl[id_col].tolist()
    sets = [set(s) for s in tbl["shingles"]]
    rows = []
    for i in range(len(ids)):
        if not sets[i]:
            continue
        for j in range(i + 1, len(ids)):
            if not sets[j]:
                continue
            jac = _jaccard(sets[i], sets[j])
            if jac >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                rows.append((a, b, jac))
    rows.sort()
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "id_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "jaccard": pa.array([round(r[2], 6) for r in rows], type=pa.float64()),
    })
