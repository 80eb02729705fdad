"""Block-max WAND top-k — the pruning scale path.

Faithful re-expression of the reference's block-max WAND
(/root/reference/src/query/boolean_query/block_wand_union.rs — pivot
selection :16-43, multi-scorer loop :148-216, single-scorer fast path
:226-265) over our bitpacked block format (compression.py): per 128-doc
block the skip entry stores the (fieldnorm_id, tf) pair maximizing the
segment-local tf factor; the query-time bound scores that pair with the
GLOBAL Bm25Weight (reference src/postings/serializer.rs:404-428,
src/query/bm25.rs:184-186).

Rank identity is preserved because pruning only skips doc ranges whose
block-bound sum cannot strictly exceed the running threshold (the collector
inserts only on strict `>`, so equal-score later docs lose anyway —
reference src/collector/sort_key/mod.rs:20-35). Full scoring of a pivot sums
term contributions in query-term order (f32), matching the exhaustive path.

Property-tested against the exhaustive scorer on random posting lists, the
same strategy as the reference's proptest (block_wand_union.rs:293-619).
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

import numpy as np

from ..bm25 import Bm25Weight
from ..index.compression import TermPostingsReader


class TermCursor:
    """Sorted-docid cursor over one term's blocks with shallow seeking."""

    __slots__ = ("reader", "weight", "term_idx", "block", "docs", "tfs",
                 "pos", "block_bounds", "term_max", "_exhausted", "fids")

    def __init__(self, reader: TermPostingsReader, weight: Bm25Weight,
                 fieldnorm_ids: np.ndarray, term_idx: int):
        self.reader = reader
        self.weight = weight
        self.fids = fieldnorm_ids
        self.term_idx = term_idx
        # per-block upper bounds from the stored (fieldnorm_id, tf) pair
        self.block_bounds = weight.score(
            np.asarray(reader.wand_fid, dtype=np.uint8),
            np.asarray(reader.wand_tf, dtype=np.uint32),
        )
        self.term_max = float(self.block_bounds.max()) if len(self.block_bounds) else 0.0
        self.block = 0
        self.pos = 0
        self._exhausted = reader.doc_freq == 0
        self.docs = None
        self.tfs = None
        if not self._exhausted:
            self._load_block(0)

    def _load_block(self, b: int) -> None:
        self.block = b
        self.docs, self.tfs = self.reader.decode_block(b)
        self.pos = 0

    @property
    def exhausted(self) -> bool:
        return self._exhausted

    def doc(self) -> int:
        return int(self.docs[self.pos])

    def score_current(self) -> np.float32:
        d = self.docs[self.pos]
        return self.weight.score(
            self.fids[d:d + 1], self.tfs[self.pos:self.pos + 1]
        )[0]

    def advance(self) -> bool:
        self.pos += 1
        if self.pos >= len(self.docs):
            if self.block + 1 >= self.reader.n_blocks:
                self._exhausted = True
                return False
            self._load_block(self.block + 1)
        return True

    def seek(self, target: int) -> bool:
        """Advance to first doc >= target."""
        if self._exhausted:
            return False
        last = self.reader.last_doc
        if last[self.block] < target:
            nb = int(np.searchsorted(last, target, side="left"))
            if nb >= self.reader.n_blocks:
                self._exhausted = True
                return False
            self._load_block(nb)
        self.pos = int(np.searchsorted(self.docs[self.pos:], target) + self.pos)
        if self.pos >= len(self.docs):  # defensive; block guarantees containment
            return self.advance()
        return True

    # --- shallow (no decode) ---
    def shallow_block_for(self, target: int) -> int:
        """Index of first block whose last_doc >= target (no decode)."""
        last = self.reader.last_doc
        if last[self.block] >= target:
            return self.block
        return int(np.searchsorted(last, target, side="left"))

    def block_max(self, target: int) -> float:
        b = self.shallow_block_for(target)
        if b >= self.reader.n_blocks:
            return 0.0
        return float(self.block_bounds[b])

    def block_last(self, target: int) -> int:
        b = self.shallow_block_for(target)
        if b >= self.reader.n_blocks:
            return np.iinfo(np.uint32).max
        return int(self.reader.last_doc[b])


class _TopK:
    """k-best collector with the reference heap semantics: insert only on
    strict score > threshold once full; worst entry = (lowest score,
    highest doc)."""

    __slots__ = ("k", "heap")

    def __init__(self, k: int):
        self.k = k
        self.heap: List[Tuple[float, int]] = []  # (score, -doc)

    def threshold(self) -> float:
        if len(self.heap) < self.k:
            return float("-inf")
        return self.heap[0][0]

    def offer(self, score: float, doc: int) -> None:
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, (score, -doc))
        elif score > self.heap[0][0]:
            heapq.heapreplace(self.heap, (score, -doc))

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        items = sorted(self.heap, key=lambda h: (-h[0], -h[1]))
        docs = np.array([-d for _, d in items], dtype=np.uint32)
        scores = np.array([s for s, _ in items], dtype=np.float32)
        return docs, scores


def _single_term_topk(reader: TermPostingsReader, weight: Bm25Weight,
                      fids: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Single-scorer fast path (reference block_wand_union.rs:226-265):
    skip whole blocks whose bound cannot beat the threshold; decode the
    rest vectorized."""
    bounds = weight.score(
        np.asarray(reader.wand_fid, dtype=np.uint8),
        np.asarray(reader.wand_tf, dtype=np.uint32),
    )
    top = _TopK(k)
    for b in range(reader.n_blocks):
        if float(bounds[b]) <= top.threshold():
            continue
        docs, tfs = reader.decode_block(b)
        scores = weight.score(fids[docs], tfs)
        thr = top.threshold()
        for d, s in zip(docs.tolist(), scores.tolist()):
            if s > thr:
                top.offer(s, d)
                thr = top.threshold()
    return top.result()


def block_max_wand_topk(
    readers: Sequence[TermPostingsReader],
    weights: Sequence[Bm25Weight],
    fieldnorm_ids: np.ndarray,
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """OR-union top-k with block-max pruning. → (docs, scores) ordered
    (score desc, doc asc)."""
    if len(readers) == 1:
        return _single_term_topk(readers[0], weights[0], fieldnorm_ids, k)

    cursors = [
        TermCursor(r, w, fieldnorm_ids, i)
        for i, (r, w) in enumerate(zip(readers, weights))
    ]
    cursors = [c for c in cursors if not c.exhausted]
    top = _TopK(k)
    UMAX = np.iinfo(np.uint32).max

    while cursors:
        cursors.sort(key=lambda c: c.doc())
        theta = top.threshold()

        # pivot selection over term-level maxima (block_wand_union.rs:16-43)
        ub = np.float32(0.0)
        pivot_idx = -1
        for i, c in enumerate(cursors):
            ub = np.float32(ub + np.float32(c.term_max))
            if float(ub) > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot_doc = cursors[pivot_idx].doc()

        # block-level refinement
        block_ub = np.float32(0.0)
        for c in cursors[: pivot_idx + 1]:
            block_ub = np.float32(block_ub + np.float32(c.block_max(pivot_doc)))
        if float(block_ub) <= theta:
            # skip to just past the smallest block end / next cursor's doc
            boundary = min(
                c.block_last(pivot_doc) for c in cursors[: pivot_idx + 1]
            )
            if pivot_idx + 1 < len(cursors):
                boundary = min(boundary, cursors[pivot_idx + 1].doc() - 1)
            if boundary >= UMAX:
                break
            target = boundary + 1
            survivors = []
            for c in cursors:
                if c.doc() <= boundary:
                    if c.seek(target):
                        survivors.append(c)
                else:
                    survivors.append(c)
            cursors = survivors
            continue

        if cursors[0].doc() == pivot_doc:
            # all cursors [0..pivot] sit on pivot: score it fully, in
            # query-term order (f32 identity with the exhaustive path)
            on_pivot = [c for c in cursors if not c.exhausted and c.doc() == pivot_doc]
            on_pivot.sort(key=lambda c: c.term_idx)
            score = np.float32(0.0)
            for c in on_pivot:
                score = np.float32(score + c.score_current())
            top.offer(float(score), pivot_doc)
            survivors = []
            for c in cursors:
                if c.doc() == pivot_doc:
                    if c.advance():
                        survivors.append(c)
                else:
                    survivors.append(c)
            cursors = survivors
        else:
            # advance the highest-impact leading cursor to the pivot
            lead = max(
                (c for c in cursors[:pivot_idx] if c.doc() < pivot_doc),
                key=lambda c: c.term_max,
                default=None,
            )
            if lead is None:
                lead = cursors[0]
            if not lead.seek(pivot_doc):
                cursors = [c for c in cursors if not c.exhausted]
    return top.result()
