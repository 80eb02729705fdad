"""MinHash + LSH near-duplicate detection — distributed end to end.

Pipeline shape (the canonical LSH chain, every stage a Dataset op):
    map_batches(shingle → minhash signatures, fully vectorized)
  → (band_key, doc_id) rows → groupby(band_key) → candidate pairs
  → groupby(pair) dedup
  → reduce-side JOIN of candidate shingle sets to pair endpoints
    (groupby doc_id over pair-endpoint rows ∪ shingle rows)
  → groupby(pair) → exact Jaccard inside the group
No document row data (texts, shingle sets) ever lands on the driver;
the only driver-side value is the candidate doc-id array, broadcast via
``ray.put`` to prune the shingle re-read (the blessed small-side
broadcast — at extreme candidate volume pass ``prune_candidates=False``
to shingle every doc instead).

Shingles are token w-grams (default w=3) of the default analyzer's
output; documents with fewer than w tokens are excluded (their shingle
set is empty — same rule the SQL oracle applies).  Signatures use 128
universal-hash permutations ((a*x+b) mod 2^61-1, uint64 split-multiply
— see hashing.py) over vectorized SipHash shingle hashes; bands default
to 32x4 so P(miss | jaccard >= 0.8) < 1e-7 — effectively exhaustive at
the verify threshold while shuffling only (band_key, doc_id) pairs at
scale.  The reported jaccard is the EXACT shingle-set jaccard (LSH only
prunes candidates), so results match a brute-force oracle whenever the
banding recall covers the threshold.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..analyzer import analyze_batch
from ..utils import remote_args
from .hashing import (P61, affine_min_hash, band_keys, hash_strings64,
                      segment_pairs)

_MERSENNE = (1 << 61) - 1


class MinHasher:
    def __init__(self, num_perm: int = 128, seed: int = 7, shingle_w: int = 3):
        rs = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.shingle_w = shingle_w
        self.a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        # odd wraparound multipliers for the "mult" permutation family
        hi = rs.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        lo = rs.randint(0, 1 << 32, size=num_perm).astype(np.uint64)
        self.mults = ((hi << np.uint64(32)) | lo) | np.uint64(1)

    @staticmethod
    def shingles(tokens: List[str], w: int) -> List[str]:
        return [" ".join(tokens[i:i + w]) for i in range(len(tokens) - w + 1)]

    def signatures_batch(self, token_lists: List[List[str]]) -> np.ndarray:
        """(D, P) uint64 signatures; empty-shingle docs are P61-filled.

        One vectorized hash over ALL shingles in the batch and one
        (S, P) uint64 mulmod — no per-document python arithmetic.
        Shingles are left as a multiset: min over a multiset equals min
        over its set, so per-doc dedup is unnecessary for signatures."""
        w = self.shingle_w
        all_sh: List[str] = []
        starts = np.empty(len(token_lists), dtype=np.int64)
        ends = np.empty(len(token_lists), dtype=np.int64)
        for i, toks in enumerate(token_lists):
            starts[i] = len(all_sh)
            if len(toks) >= w:
                all_sh.extend(self.shingles(toks, w))
            ends[i] = len(all_sh)
        hashes = hash_strings64(all_sh)
        return affine_min_hash(hashes, self.a, self.b, starts, ends)

    def signatures_from_analyzed(self, tokens: pa.ListArray) -> np.ndarray:
        """(D, P) signatures straight from an AnalyzedBatch token
        ListArray — shingling fully vectorized: the flat token array is
        joined with its own 1- and 2-shifted views (w=3) via arrow
        binary_join_element_wise, and per-doc ranges are derived from
        the list offsets.  No per-document python at all."""
        import pyarrow.compute as pc

        w = self.shingle_w
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        flat = tokens.values
        n_docs = len(offsets) - 1
        S = len(flat)
        if S < w:
            return np.full((n_docs, self.num_perm), P61, dtype=np.uint64)
        # shingle i spans flat[i : i+w]; valid iff i+w <= doc_end
        views = [flat.slice(k, S - w + 1) for k in range(w)]
        joined = pc.binary_join_element_wise(*views, " ")
        hashes_all = hash_strings64(joined.to_numpy(zero_copy_only=False))
        # per-doc shingle ranges in the (S - w + 1)-long shingle space
        sh_starts = np.minimum(offsets[:-1], S - w + 1)
        sh_ends = np.maximum(offsets[1:] - (w - 1), sh_starts)
        # docs shorter than w tokens produce no shingles
        short = (offsets[1:] - offsets[:-1]) < w
        sh_ends[short] = sh_starts[short]
        # drop the cross-doc shingles (the w-1 gap per doc): range-union
        # mask via +1/-1 deltas, then compact the kept hashes
        delta = np.zeros(len(hashes_all) + 1, dtype=np.int64)
        np.add.at(delta, sh_starts, 1)
        np.add.at(delta, sh_ends, -1)
        for_each = np.cumsum(delta[:-1]) > 0
        kept = hashes_all[for_each]
        keep = np.zeros(len(hashes_all) + 1, dtype=np.int64)
        np.cumsum(for_each.astype(np.int64), out=keep[1:])
        c_starts = keep[sh_starts]
        c_ends = keep[sh_ends]
        return affine_min_hash(kept, self.a, self.b, c_starts, c_ends)

    def mult_signatures_from_analyzed(self, tokens: pa.ListArray) -> np.ndarray:
        """(D, P) signatures under the odd-multiplier wraparound
        permutation family (hashing.mult_min_hash — one multiply per
        (shingle, perm), ~40× faster than the Mersenne chain).  Empty
        docs are uint64-max-filled."""
        from .hashing import mult_min_hash

        kept, c_starts, c_ends = self._compact_shingle_hashes(tokens)
        return mult_min_hash(kept, self.mults, c_starts, c_ends)

    def _compact_shingle_hashes(self, tokens: pa.ListArray):
        """→ (kept shingle hashes, per-doc starts, per-doc ends) with
        cross-doc shingles dropped and ranges tiling the array."""
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        hashes_all, sh_s, sh_e = _shingle_hash_ranges(tokens,
                                                      self.shingle_w)
        delta = np.zeros(len(hashes_all) + 1, dtype=np.int64)
        np.add.at(delta, sh_s, 1)
        np.add.at(delta, sh_e, -1)
        mask = np.cumsum(delta[:-1]) > 0
        kept = hashes_all[mask]
        keep = np.zeros(len(hashes_all) + 1, dtype=np.int64)
        np.cumsum(mask.astype(np.int64), out=keep[1:])
        return kept, keep[sh_s], keep[sh_e]

    def oph_signatures_from_analyzed(self, tokens: pa.ListArray) -> np.ndarray:
        """(D, P) one-permutation signatures (hashing.oph_min_hash) from
        an AnalyzedBatch token ListArray — the same vectorized arrow
        shingling as ``signatures_from_analyzed``, with ONE hash pass
        instead of P affine permutations.  Empty docs are
        _OPH_EMPTY-filled."""
        from .hashing import oph_min_hash

        kept, c_starts, c_ends = self._compact_shingle_hashes(tokens)
        return oph_min_hash(kept, c_starts, c_ends, self.num_perm)

    def signature(self, tokens: List[str]) -> Optional[np.ndarray]:
        sig = self.signatures_batch([tokens])[0]
        return None if (sig == P61).all() else sig


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def _shingle_hash_ranges(tokens: pa.ListArray, w: int):
    """→ (flat shingle hashes, per-doc start, per-doc end) — the
    vectorized arrow shingling shared with signatures_from_analyzed
    (cross-doc shingles excluded via the per-doc range bounds)."""
    import pyarrow.compute as pc

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = tokens.values
    n_docs = len(offsets) - 1
    S = len(flat)
    if S < w:
        z = np.zeros(n_docs, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), z, z
    views = [flat.slice(k, S - w + 1) for k in range(w)]
    joined = pc.binary_join_element_wise(*views, " ")
    hashes_all = hash_strings64(joined.to_numpy(zero_copy_only=False))
    sh_starts = np.minimum(offsets[:-1], S - w + 1)
    sh_ends = np.maximum(offsets[1:] - (w - 1), sh_starts)
    short = (offsets[1:] - offsets[:-1]) < w
    sh_ends[short] = sh_starts[short]
    return hashes_all, sh_starts, sh_ends


def _empty_pairs() -> pa.Table:
    return pa.table({"id_a": pa.array([], type=pa.int64()),
                     "id_b": pa.array([], type=pa.int64()),
                     "jaccard": pa.array([], type=pa.float64())})


_JOIN_SCHEMA = pa.schema([
    ("jkey", pa.int64()),
    ("pair_a", pa.int64()),
    ("pair_b", pa.int64()),
    ("side", pa.int32()),
    ("hashes", pa.list_(pa.uint64())),
])


def _unique_hash_lists(tokens, shingle_w: int) -> pa.ListArray:
    """Per-doc UNIQUE shingle-hash lists, fully vectorized: one arrow
    shingle join + hash over the whole batch, then a (doc, hash) lexsort
    + run-length dedup — no per-document python."""
    hashes_all, sh_s, sh_e = _shingle_hash_ranges(tokens, shingle_w)
    lens = sh_e - sh_s
    n = len(lens)
    if lens.sum() == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int64), type=pa.int32()),
            pa.array(np.empty(0, dtype=np.uint64), type=pa.uint64()))
    # compact the kept ranges (drop cross-doc shingles)
    delta = np.zeros(len(hashes_all) + 1, dtype=np.int64)
    np.add.at(delta, sh_s, 1)
    np.add.at(delta, sh_e, -1)
    mask = np.cumsum(delta[:-1]) > 0
    kept = hashes_all[mask]
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((kept, doc_rep))
    d2, h2 = doc_rep[order], kept[order]
    new = np.empty(len(d2), dtype=bool)
    new[0] = True
    new[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
    flat = h2[new]
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, d2[new], 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat, type=pa.uint64()))


def _make_shingle_stage(needed_ref, text_col: str, id_col: str,
                        shingle_w: int, analyzer: str):
    """Shingle the candidate docs only.  The candidate id array is a
    ``ray.put`` broadcast: each task fetches it zero-copy from the local
    object store (never re-shipped per batch in a closure)."""

    def stage(batch: pa.Table) -> pa.Table:
        import ray

        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        if needed_ref is not None:
            needed = ray.get(needed_ref)
            pos = np.searchsorted(needed, ids).clip(0, len(needed) - 1)
            keep = np.flatnonzero(needed[pos] == ids)
            if len(keep) == 0:
                return pa.Table.from_pydict(
                    {f.name: [] for f in _JOIN_SCHEMA}, schema=_JOIN_SCHEMA)
            batch = batch.take(pa.array(keep, type=pa.int64()))
            ids = ids[keep]
        out = analyze_batch(batch.column(text_col), analyzer)
        hl = _unique_hash_lists(out.tokens, shingle_w)
        n = len(ids)
        return pa.table({
            "jkey": pa.array(ids, type=pa.int64()),
            "pair_a": pa.array(np.full(n, -1, dtype=np.int64)),
            "pair_b": pa.array(np.full(n, -1, dtype=np.int64)),
            "side": pa.array(np.full(n, 2, dtype=np.int32)),
            "hashes": hl,
        }).cast(_JOIN_SCHEMA)

    return stage


def _bucket_pairs_block(tbl: pa.Table, id_col: str) -> pa.Table:
    """All candidate pairs in one bkey-sorted block, fully vectorized:
    one (bkey, id) lexsort dedups repeated ids per bucket, then
    segment_pairs enumerates every within-bucket pair in one gather (no
    per-bucket python — the round-4 version looped real buckets)."""
    n = tbl.num_rows
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})
    if n == 0:
        return empty
    k = tbl.column("bkey").to_numpy()
    ids_np = tbl.column(id_col).to_numpy()
    order = np.lexsort((ids_np, k))
    k2, i2 = k[order], ids_np[order]
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = (k2[1:] != k2[:-1]) | (i2[1:] != i2[:-1])
    k3, i3 = k2[keep], i2[keep]
    change = np.empty(len(k3), dtype=bool)
    change[0] = True
    change[1:] = k3[1:] != k3[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(k3))
    ii, jj = segment_pairs(starts, ends)
    if len(ii) == 0:
        return empty
    return pa.table({
        "id_a": pa.array(i3[ii].astype(np.int64), type=pa.int64()),
        "id_b": pa.array(i3[jj].astype(np.int64), type=pa.int64()),
    })


_ATTACH_SCHEMA = pa.schema([("pair_a", pa.int64()), ("pair_b", pa.int64()),
                            ("side", pa.int32()),
                            ("hashes", pa.list_(pa.uint64()))])


def _attach_shingles_block(tbl: pa.Table) -> pa.Table:
    """Join step (jkey-sorted block): each doc's hash row is fanned to
    its pair-endpoint rows; duplicate (pair, side) endpoints (the same
    pair firing in several bands) collapse here.  Fully vectorized:
    run-length groups over the sorted jkey column + one lexsort dedup of
    the endpoint rows + one gather to replicate the hash slices."""
    n = tbl.num_rows
    if n == 0:
        return pa.Table.from_pydict(
            {f.name: [] for f in _ATTACH_SCHEMA}, schema=_ATTACH_SCHEMA)
    tbl = tbl.combine_chunks()
    jk = tbl.column("jkey").to_numpy()
    side = tbl.column("side").to_numpy()
    p_a = tbl.column("pair_a").to_numpy()
    p_b = tbl.column("pair_b").to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = jk[1:] != jk[:-1]
    gid = np.cumsum(change.astype(np.int64)) - 1
    n_groups = int(gid[-1]) + 1
    hl = tbl.column("hashes").combine_chunks()
    offs = hl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = hl.values.to_numpy(zero_copy_only=False)
    # per group: the (single) side-2 row's hash slice, empty if none
    g_start = np.zeros(n_groups, dtype=np.int64)
    g_len = np.zeros(n_groups, dtype=np.int64)
    sh_rows = np.flatnonzero(side == 2)
    g_start[gid[sh_rows]] = offs[sh_rows]
    g_len[gid[sh_rows]] = offs[sh_rows + 1] - offs[sh_rows]
    # dedup endpoints by (group, pair, side) — all-numeric lexsort
    ends = np.flatnonzero(side != 2)
    if len(ends) == 0:
        return pa.Table.from_pydict(
            {f.name: [] for f in _ATTACH_SCHEMA}, schema=_ATTACH_SCHEMA)
    eg, ea, eb, es = gid[ends], p_a[ends], p_b[ends], side[ends]
    order = np.lexsort((es, eb, ea, eg))
    eg, ea, eb, es = eg[order], ea[order], eb[order], es[order]
    new = np.empty(len(eg), dtype=bool)
    new[0] = True
    new[1:] = ((eg[1:] != eg[:-1]) | (ea[1:] != ea[:-1])
               | (eb[1:] != eb[:-1]) | (es[1:] != es[:-1]))
    eg, ea, eb, es = eg[new], ea[new], eb[new], es[new]
    # replicate each endpoint's group hash slice: standard arange gather
    out_lens = g_len[eg]
    total = int(out_lens.sum())
    out_offsets = np.zeros(len(eg) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offsets[1:])
    if total:
        idx = (np.repeat(g_start[eg], out_lens)
               + np.arange(total, dtype=np.int64)
               - np.repeat(out_offsets[:-1], out_lens))
        out_flat = flat[idx]
    else:
        out_flat = np.empty(0, dtype=np.uint64)
    return pa.table({
        "pair_a": pa.array(ea, type=pa.int64()),
        "pair_b": pa.array(eb, type=pa.int64()),
        "side": pa.array(es, type=pa.int32()),
        "hashes": pa.ListArray.from_arrays(
            pa.array(out_offsets, type=pa.int32()),
            pa.array(out_flat, type=pa.uint64())),
    }).cast(_ATTACH_SCHEMA)


def _make_pair_jaccard_block(threshold: float):
    """(pair_a, pair_b)-sorted block → verified pairs.  Same np.unique
    run-length jaccard as the fused path (size-2 (pair, hash) runs are
    intersection members; hashes are unique within each side)."""

    def block_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty_pairs()
        tbl = tbl.combine_chunks()
        p_a = tbl.column("pair_a").to_numpy()
        p_b = tbl.column("pair_b").to_numpy()
        n = len(p_a)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (p_a[1:] != p_a[:-1]) | (p_b[1:] != p_b[:-1])
        gid = np.cumsum(change.astype(np.int64)) - 1
        g_first = np.flatnonzero(change)
        n_groups = len(g_first)
        hl = tbl.column("hashes").combine_chunks()
        offs = hl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = hl.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        gid_rep = np.repeat(gid, lens)
        order = np.lexsort((flat, gid_rep))
        g2, h2 = gid_rep[order], flat[order]
        union = np.zeros(n_groups, dtype=np.int64)
        inter = np.zeros(n_groups, dtype=np.int64)
        if len(g2):
            new = np.empty(len(g2), dtype=bool)
            new[0] = True
            new[1:] = (g2[1:] != g2[:-1]) | (h2[1:] != h2[:-1])
            gstarts = np.flatnonzero(new)
            gsizes = np.diff(np.append(gstarts, len(g2)))
            np.add.at(union, g2[gstarts], 1)
            np.add.at(inter, g2[gstarts], (gsizes == 2).astype(np.int64))
        ok = union > 0
        jac = np.zeros(n_groups, dtype=np.float64)
        jac[ok] = inter[ok] / union[ok]
        hit = np.flatnonzero(jac >= threshold)
        return pa.table({
            "id_a": pa.array(p_a[g_first[hit]], type=pa.int64()),
            "id_b": pa.array(p_b[g_first[hit]], type=pa.int64()),
            "jaccard": pa.array(np.round(jac[hit], 6), type=pa.float64()),
        })

    return block_fn


def _fused_verify(ds, cand, text_col: str, id_col: str, threshold: float,
                  shingle_w: int, analyzer: str) -> pa.Table:
    """Verify candidate pairs with ONE exchange (round-3 fusion of the
    round-2 attach + jaccard sorts): the deduped candidate-pair arrays
    are a ``ray.put`` broadcast (ids only — bounded by candidate volume,
    the same contract as the round-2 candidate-id broadcast), so the
    shingle stage fans each doc's hashed shingle set DIRECTLY to its
    (pair, side) slots; one sort(pair) then computes every pair's exact
    jaccard fully vectorized (np.unique run-lengths over (pair, hash) —
    no iterrows, no per-group pandas).  Jaccard over 64-bit shingle
    hashes equals string-set jaccard up to ~1e-13 collision odds."""
    import ray

    allp = pa.concat_tables(
        list(cand.iter_batches(batch_format="pyarrow"))) \
        if cand is not None else None
    if allp is None or allp.num_rows == 0:
        return _empty_pairs()
    a = allp.column("id_a").to_numpy().astype(np.int64)
    b = allp.column("id_b").to_numpy().astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    a, b = a[keep], b[keep]
    n_pairs = len(a)
    # doc -> (pair, side) slots, sorted by doc id for searchsorted lookup
    docs = np.concatenate([a, b])
    pcode = np.tile(np.arange(n_pairs, dtype=np.int64), 2)
    side = np.repeat(np.array([0, 1], dtype=np.int32), n_pairs)
    o = np.argsort(docs, kind="stable")
    lookup_ref = ray.put((docs[o], pcode[o], a, b))

    out_schema = pa.schema([("pair", pa.int64()),
                            ("hashes", pa.list_(pa.uint64()))])

    def fanout(batch: pa.Table) -> pa.Table:
        docs_s, pcode_s, _, _ = ray.get(lookup_ref)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        lo = np.searchsorted(docs_s, ids, side="left")
        hi = np.searchsorted(docs_s, ids, side="right")
        sel = np.flatnonzero(hi > lo)
        if len(sel) == 0:
            return pa.Table.from_pydict({"pair": [], "hashes": []},
                                        schema=out_schema)
        sub = batch.take(pa.array(sel, type=pa.int64()))
        out = analyze_batch(sub.column(text_col), analyzer)
        # per-doc UNIQUE hash lists (one lexsort dedup for the batch)
        hl = _unique_hash_lists(out.tokens, shingle_w)
        d_offs = hl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        d_flat = hl.values.to_numpy(zero_copy_only=False)
        d_lens = np.diff(d_offs)
        # fan each doc row to its [lo, hi) pair slots — one arange gather
        rep = (hi - lo)[sel]
        slot_idx = (np.repeat(lo[sel], rep)
                    + np.arange(int(rep.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(rep) - rep, rep))
        pair_arr = pcode_s[slot_idx]
        row_rep = np.repeat(np.arange(len(sel), dtype=np.int64), rep)
        out_lens = d_lens[row_rep]
        total = int(out_lens.sum())
        out_offsets = np.zeros(len(row_rep) + 1, dtype=np.int64)
        np.cumsum(out_lens, out=out_offsets[1:])
        if total:
            gidx = (np.repeat(d_offs[row_rep], out_lens)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(out_offsets[:-1], out_lens))
            out_flat = d_flat[gidx]
        else:
            out_flat = np.empty(0, dtype=np.uint64)
        return pa.table({
            "pair": pa.array(pair_arr, type=pa.int64()),
            "hashes": pa.ListArray.from_arrays(
                pa.array(out_offsets, type=pa.int32()),
                pa.array(out_flat, type=pa.uint64())),
        })

    fan = ds.map_batches(fanout, batch_format="pyarrow", **remote_args())

    def jaccard_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty_pairs()
        a_s, b_s = ray.get(lookup_ref)[2:]
        pair = tbl.column("pair").to_numpy()
        hl = tbl.column("hashes").combine_chunks()
        offs = hl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = hl.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        pair_rep = np.repeat(pair, lens)
        # run-lengths over sorted (pair, hash): a size-2 group is an
        # intersection member (hashes are unique within each side)
        order = np.lexsort((flat, pair_rep))
        p2, h2 = pair_rep[order], flat[order]
        new = np.empty(len(p2), dtype=bool)
        if len(p2):
            new[0] = True
            new[1:] = (p2[1:] != p2[:-1]) | (h2[1:] != h2[:-1])
        gstarts = np.flatnonzero(new)
        gsizes = np.diff(np.append(gstarts, len(p2)))
        gpair = p2[gstarts]
        present = np.unique(pair)
        union = np.zeros(len(present), dtype=np.int64)
        inter = np.zeros(len(present), dtype=np.int64)
        if len(gpair):
            gidx = np.searchsorted(present, gpair)
            np.add.at(union, gidx, 1)
            np.add.at(inter, gidx, (gsizes == 2).astype(np.int64))
        ok = union > 0
        jac = np.zeros(len(present), dtype=np.float64)
        jac[ok] = inter[ok] / union[ok]
        hit = jac >= threshold
        sel = present[hit]
        return pa.table({
            "id_a": pa.array(a_s[sel], type=pa.int64()),
            "id_b": pa.array(b_s[sel], type=pa.int64()),
            "jaccard": pa.array(np.round(jac[hit], 6), type=pa.float64()),
        })

    verified = fan.sort("pair").map_batches(
        jaccard_block, batch_size=None, batch_format="pyarrow",
        **remote_args(),
    )
    pdf = verified.to_pandas()
    if len(pdf) == 0:
        return _empty_pairs()
    pdf = pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(pdf["id_a"].astype(np.int64)),
        "id_b": pa.array(pdf["id_b"].astype(np.int64)),
        "jaccard": pa.array(pdf["jaccard"].astype(np.float64)),
    })


# the fused verify holds the deduped candidate-pair id arrays on the
# driver (then ray.put): bounded by candidate volume, so above this cap
# the reduce-side-join path (which never centralizes pairs) takes over
DEFAULT_CANDIDATE_BROADCAST_CAP = 20_000_000


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_w: int = 3,
    analyzer: str = "default",
    prune_candidates: bool = True,
    candidate_broadcast_cap: int = DEFAULT_CANDIDATE_BROADCAST_CAP,
    sig_method: str = "mult",
) -> pa.Table:
    """→ pa.Table (id_a, id_b, jaccard) for verified near-dup pairs,
    id_a < id_b.  See module docstring for the distributed shape.
    ``prune_candidates=True`` auto-falls back to the reduce-side join
    when the candidate-pair count exceeds ``candidate_broadcast_cap``
    (the fused path's driver/broadcast bound).

    ``sig_method``: ``"mult"`` (default) = k odd-multiplier wraparound
    permutations (bijections of the hash space — the same 2-universal
    family class as the Mersenne chain at ONE multiply per
    (shingle, perm); pair-set-identical to "affine" at sf0.001 / 0.01 /
    sf1 / sf3, 6.4× faster end-to-end at sf3).  ``"affine"`` = the
    classic (a·x+b) mod 2^61-1 permutations (the reference family,
    kept as the cross-check).
    ``"oph"`` = one-permutation hashing with rotation densification
    (Li/Owen/Zhang NIPS'12; Shrivastava/Li ICML'14) — ONE hash pass
    instead of k permutations (~15× less signature arithmetic per
    batch, measured), for corpora of LONG documents.  Sparse docs
    (< 2×num_perm shingles) additionally emit classic affine bands in
    a salted second bucket family, because OPH resolution degrades
    below ~1 shingle/bin (a measured near-threshold miss) — the
    J >= t length filter guarantees a qualifying pair is either
    both-sparse (affine family) or both-dense (OPH family), so the
    union loses nothing; verified pair-set-identical to "affine" at
    sf1 and sf3.  Either way the reported pairs are EXACT-jaccard
    verified — the method only shapes candidate recall."""
    import ray

    from .hashing import _OPH_EMPTY

    if sig_method not in ("oph", "affine", "mult"):
        raise ValueError(f"unknown sig_method {sig_method!r}")
    hasher = MinHasher(num_perm, shingle_w=shingle_w)
    rows_per_band = num_perm // bands
    # OPH rotation densification copies values in contiguous-bin RUNS
    # for sparse docs; CONTIGUOUS bands would then fire whenever a run
    # covers them (P(band) ≈ agreement, not agreement^rows — measured
    # 9.2M candidates vs 85k at sf1).  A strided bin→band assignment
    # (band b ← bins b, b+bands, b+2*bands, …) spreads every band
    # across the circle, restoring near-independent rows per band.
    oph_perm = (np.arange(num_perm).reshape(rows_per_band, bands)
                .T.ravel())
    # docs far sparser than the bin count carry too few distinct values
    # for OPH banding (a 14-shingle doc has 14-sample resolution — a
    # measured near-threshold miss); such docs ALSO emit exact affine
    # bands.  Affine cost is shingles × P, so sparse docs are cheap by
    # definition, and the J >= t length filter (sizes within ratio t)
    # means a qualifying pair is either both under ~2×bins (affine
    # family catches it) or both dense enough for OPH — the family
    # salt keeps the two bucket spaces disjoint.
    oph_sparse_cutoff = 2 * num_perm
    _FAMILY_SALT = np.uint64(0xD1B54A32D192ED03)

    def stage_bands(batch: pa.Table) -> pa.Table:
        out = analyze_batch(batch.column(text_col), analyzer)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        tokens = out.tokens
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        if sig_method in ("affine", "mult"):
            if sig_method == "affine":
                sigs = hasher.signatures_from_analyzed(tokens)
                fill = P61
            else:
                sigs = hasher.mult_signatures_from_analyzed(tokens)
                fill = _OPH_EMPTY
            nonempty = np.flatnonzero(~(sigs == fill).all(axis=1))
            if len(nonempty) == 0:
                return pa.table({"bkey": pa.array([], type=pa.uint64()),
                                 id_col: pa.array([], type=pa.int64())})
            keys = band_keys(sigs[nonempty], bands)       # (D', bands)
            return pa.table({
                "bkey": pa.array(keys.ravel(), type=pa.uint64()),
                id_col: pa.array(np.repeat(ids[nonempty], bands),
                                 type=pa.int64()),
            })
        sigs = hasher.oph_signatures_from_analyzed(tokens)[:, oph_perm]
        nonempty = np.flatnonzero(~(sigs == _OPH_EMPTY).all(axis=1))
        if len(nonempty) == 0:
            return pa.table({"bkey": pa.array([], type=pa.uint64()),
                             id_col: pa.array([], type=pa.int64())})
        key_chunks = [band_keys(sigs[nonempty], bands).ravel()]
        id_chunks = [np.repeat(ids[nonempty], bands)]
        tok_counts = np.diff(tokens.offsets.to_numpy(
            zero_copy_only=False).astype(np.int64))
        sh_counts = np.maximum(tok_counts - shingle_w + 1, 0)
        sparse = np.flatnonzero((sh_counts > 0)
                                & (sh_counts < oph_sparse_cutoff))
        if len(sparse):
            sub = tokens.take(pa.array(sparse, type=pa.int64()))
            asigs = hasher.signatures_from_analyzed(sub)
            akeys = band_keys(asigs, bands) ^ _FAMILY_SALT
            key_chunks.append(akeys.ravel())
            id_chunks.append(np.repeat(ids[sparse], bands))
        return pa.table({
            "bkey": pa.array(np.concatenate(key_chunks), type=pa.uint64()),
            id_col: pa.array(np.concatenate(id_chunks), type=pa.int64()),
        })

    banded = ds.map_batches(stage_bands, batch_format="pyarrow",
                            **remote_args())

    # bucket pairs: sort(bkey) + whole-block vectorized run-length scan
    # (a per-group map_groups would pay pandas slicing on every
    # singleton bucket — the vast majority)
    cand = banded.sort("bkey").map_batches(
        lambda t: _bucket_pairs_block(t, id_col),
        batch_size=None, batch_format="pyarrow", **remote_args(),
    ).materialize()  # consumed once for count, once for the verify

    if prune_candidates and cand.count() > candidate_broadcast_cap:
        import logging

        logging.getLogger(__name__).info(
            "minhash: %d candidate pairs exceed the broadcast cap %d — "
            "switching to the reduce-side join verify",
            cand.count(), candidate_broadcast_cap)
        prune_candidates = False

    if prune_candidates:
        # fused verify: ONE exchange, vectorized jaccard (round-3).
        # prune_candidates=False keeps the reduce-side join below for
        # candidate volumes too large to broadcast as id arrays.
        return _fused_verify(ds, cand, text_col, id_col, threshold,
                             shingle_w, analyzer)

    # pair-endpoint rows for the reduce-side join (duplicate pairs from
    # multiple bands collapse inside the join stage)
    def endpoints(t: pa.Table) -> pa.Table:
        ia = t.column("id_a").to_numpy().astype(np.int64)
        ib = t.column("id_b").to_numpy().astype(np.int64)
        n2 = 2 * len(ia)
        return pa.table({
            "jkey": pa.array(np.concatenate([ia, ib]), type=pa.int64()),
            "pair_a": pa.array(np.tile(ia, 2), type=pa.int64()),
            "pair_b": pa.array(np.tile(ib, 2), type=pa.int64()),
            "side": pa.array(np.repeat(np.array([0, 1], dtype=np.int32),
                                       len(ia))),
            "hashes": pa.ListArray.from_arrays(
                pa.array(np.zeros(n2 + 1, dtype=np.int64), type=pa.int32()),
                pa.array(np.empty(0, dtype=np.uint64), type=pa.uint64())),
        }).cast(_JOIN_SCHEMA)

    ends_ds = cand.map_batches(endpoints, batch_format="pyarrow",
                               **remote_args())
    # consumed twice (candidate-id pass + the join union): materialize so
    # the banding/sort/bucket chain does not re-execute
    ends_ds = ends_ds.materialize()

    # this branch (prune_candidates=False) shingles ALL docs — no
    # candidate broadcast, for when even the id arrays would not fit
    needed_ref = None

    shingle_ds = ds.map_batches(
        _make_shingle_stage(needed_ref, text_col, id_col, shingle_w,
                            analyzer),
        batch_format="pyarrow",
        **remote_args(),
    )

    joined = ends_ds.union(shingle_ds).sort("jkey").map_batches(
        _attach_shingles_block, batch_size=None, batch_format="pyarrow",
        **remote_args(),
    )
    verified = joined.sort(["pair_a", "pair_b"]).map_batches(
        _make_pair_jaccard_block(threshold), batch_size=None,
        batch_format="pyarrow", **remote_args(),
    )
    pdf = verified.to_pandas()
    if len(pdf) == 0:
        return _empty_pairs()
    pdf = pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(pdf["id_a"].astype(np.int64)),
        "id_b": pa.array(pdf["id_b"].astype(np.int64)),
        "jaccard": pa.array(pdf["jaccard"].astype(np.float64)),
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
