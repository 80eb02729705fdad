"""Deletes — tombstones + alive filtering.

Reference semantics (ARCHITECTURE.md §Deletes; src/indexer/delete_queue.rs,
src/fastfield/alive_bitset.rs:20): a delete-by-term marks matching docs in
an alive bitset; the docs stay in the postings until a merge physically
drops them, and GLOBAL statistics (doc_freq, total_num_tokens) keep
counting deleted docs until that merge — scoring therefore matches the
reference's behavior exactly in the deleted-but-not-merged window.

Our shape: per-segment ``deletes.bin`` (sorted uint32 doc ids), written
atomically (tmp + rename); SegmentReader exposes an alive mask; scorers
drop dead candidates after scoring; the merge's ExplodeSegment filters
dead postings so merged output is physically clean (reference
src/indexer/merger.rs:736-745).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

from .manifest import load_manifest
from .segment import SegmentReader, segment_dir_name

DELETES_FILE = "deletes.bin"


def read_tombstones(seg_path: str) -> Optional[np.ndarray]:
    p = os.path.join(seg_path, DELETES_FILE)
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    return np.fromfile(p, dtype=np.uint32)


def write_tombstones(seg_path: str, doc_ids: np.ndarray) -> None:
    """Replace the tombstone set atomically (ids are sorted + deduped)."""
    ids = np.unique(np.asarray(doc_ids, dtype=np.uint32))
    tmp = os.path.join(seg_path, DELETES_FILE + ".tmp")
    ids.tofile(tmp)
    os.replace(tmp, os.path.join(seg_path, DELETES_FILE))


def add_tombstones(seg_path: str, doc_ids: Iterable[int]) -> int:
    """Union new doc ids into the segment's tombstones. → total dead."""
    new = np.asarray(list(doc_ids), dtype=np.uint32)
    cur = read_tombstones(seg_path)
    merged = new if cur is None else np.union1d(cur, new)
    write_tombstones(seg_path, merged)
    return len(merged)


def _segments_below(manifest, max_ord: Optional[int]) -> List[Dict]:
    """Segments the delete op may touch: opstamp ordering means a delete
    only applies to segments sealed before it was queued (reference
    index_writer.rs orders ops by opstamp — docs added AFTER a delete
    survive it).  ``max_ord=None`` means all segments."""
    if max_ord is None:
        return list(manifest.segments)
    return [s for s in manifest.segments if s["segment_ord"] < max_ord]


def delete_by_term(index_dir: str, term: str,
                   max_ord: Optional[int] = None) -> Dict[int, int]:
    """Delete every doc containing `term` (the reference's delete-by-term,
    src/indexer/index_writer.rs delete path). → {segment_ord: n_deleted}.

    Runs as small Ray tasks (one per segment) — each touches only its own
    segment's postings and tombstone file."""
    import ray

    from ..utils import remote_args

    manifest = load_manifest(index_dir)

    @ray.remote
    def _one(seg_ord: int) -> tuple:
        seg_path = os.path.join(index_dir, segment_dir_name(seg_ord))
        r = SegmentReader(seg_path)
        p = r.postings(term)
        if p is None or len(p[0]) == 0:
            return seg_ord, 0
        return seg_ord, add_tombstones(seg_path, p[0])

    refs = [
        _one.options(**remote_args()).remote(
            s["segment_ord"])
        for s in _segments_below(manifest, max_ord)
    ]
    return dict(ray.get(refs))


def clear_tombstones(index_dir: str) -> None:
    manifest = load_manifest(index_dir)
    for s in manifest.segments:
        p = os.path.join(index_dir, segment_dir_name(s["segment_ord"]),
                         DELETES_FILE)
        if os.path.exists(p):
            os.remove(p)


def delete_by_query(index_dir: str, query,
                    max_ord: Optional[int] = None) -> Dict[int, int]:
    """Delete every doc matching `query` (the reference's delete_query,
    src/indexer/index_writer.rs:698 — evaluated per segment at delete
    time).  → {segment_ord: total dead in segment}.

    One small Ray task per segment: each evaluates the query against its
    own segment (the same per-segment evaluator the searcher uses) and
    unions the matching docs into that segment's tombstones."""
    import ray

    from ..utils import remote_args

    manifest = load_manifest(index_dir)
    avg = manifest.average_fieldnorm
    total_docs = manifest.total_num_docs

    @ray.remote
    def _one(seg_ord: int) -> tuple:
        from ..search.query import QueryEvaluator

        seg_path = os.path.join(index_dir, segment_dir_name(seg_ord))
        r = SegmentReader(seg_path)
        ev = QueryEvaluator(r, total_num_docs=total_docs,
                            average_fieldnorm=avg)
        docs, _ = ev.evaluate(query)
        if len(docs) == 0:
            return seg_ord, 0
        return seg_ord, add_tombstones(seg_path, docs)

    refs = [
        _one.options(**remote_args()).remote(s["segment_ord"])
        for s in _segments_below(manifest, max_ord)
    ]
    return dict(ray.get(refs))


def delete_all_documents(index_dir: str,
                         max_ord: Optional[int] = None) -> Dict[int, int]:
    """Tombstone every live doc (reference delete_all_documents,
    index_writer.rs:522 — the index serves empty until a merge/compaction
    physically drops the segments)."""
    import ray

    from ..utils import remote_args

    manifest = load_manifest(index_dir)

    @ray.remote
    def _one(seg_ord: int, num_docs: int) -> tuple:
        seg_path = os.path.join(index_dir, segment_dir_name(seg_ord))
        write_tombstones(seg_path, np.arange(num_docs, dtype=np.uint32))
        return seg_ord, num_docs

    refs = [
        _one.options(**remote_args()).remote(
            s["segment_ord"], s["num_docs"])
        for s in _segments_below(manifest, max_ord)
    ]
    return dict(ray.get(refs))
