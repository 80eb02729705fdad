"""Segment compaction — LogMergePolicy-style planner + physical merge.

Reference: the background merge pipeline (SegmentUpdater →
LogMergePolicy → SegmentMerger, /root/reference/src/indexer/
segment_updater.rs:490-578, log_merge_policy.rs:8-15 — level_log_size
0.75, min_layer_size 10_000, min 8 segments per merge, <= 10M docs
result; merger doc-id stacking merger.rs:697-708).

Our shape: the PLANNER runs on the driver over manifest metadata only
(segment sizes); each planned merge is one Ray task that stacks the
source segments' postings (dropping tombstoned docs), re-encodes a new
physical segment, and the driver atomically republishes the manifest with
the new segment list — the same atomic-swap step the reference performs.

Doc-id mapping: new local ids = stacking order (source segments in
ascending ordinal, alive docs in ascending old id) — exactly the
reference's merge stacking, so (segment_ord, doc_id) stays deterministic.
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import IndexManifest, load_manifest, write_manifest
from .segment import SegmentReader, build_segment_from_table, segment_dir_name


class LogMergePolicy:
    """Bucket segments by log(num_docs); propose merges of >= min_num
    same-level segments (reference log_merge_policy.rs defaults)."""

    def __init__(self, min_num_segments: int = 8,
                 max_docs_before_merge: int = 10_000_000,
                 min_layer_size: int = 10_000,
                 level_log_size: float = 0.75):
        self.min_num_segments = min_num_segments
        self.max_docs_before_merge = max_docs_before_merge
        self.min_layer_size = min_layer_size
        self.level_log_size = level_log_size

    def compute_merge_candidates(self, segments: List[Dict]) -> List[List[int]]:
        eligible = [s for s in segments
                    if s["num_docs"] <= self.max_docs_before_merge]
        if not eligible:
            return []
        levels: Dict[int, List[int]] = {}
        for s in eligible:
            size = max(s["num_docs"], self.min_layer_size)
            level = int(math.floor(math.log(size) / math.log(2)
                                   * self.level_log_size))
            levels.setdefault(level, []).append(s["segment_ord"])
        out = []
        for level in sorted(levels, reverse=True):
            ords = sorted(levels[level])
            if len(ords) >= self.min_num_segments:
                out.append(ords)
        return out


def _rebuild_segment(index_dir: str, source_ords: List[int],
                     new_ord: int, manifest: IndexManifest) -> Dict:
    """Stack alive docs of the source segments into one new segment."""
    readers = [
        SegmentReader(os.path.join(index_dir, segment_dir_name(o)))
        for o in sorted(source_ords)
    ]
    tables = []
    for r in readers:
        t = pq.read_table(os.path.join(r.path, "docs.parquet"))
        if manifest.id_col != "doc_id":
            # drop the local-ordinal column (when id_col IS "doc_id" the
            # store holds only the original ids under that name)
            t = t.drop_columns(["doc_id"])
        if r.alive_mask is not None:
            t = t.filter(pa.array(r.alive_mask))
        # re-read the indexed text from the docstore? the docstore keeps
        # only keys + fast fields — the text must be re-read from the
        # source via lineage OR the build must have stored it. We store
        # text in the doc store when compaction is intended (see
        # build_segment_from_table(fast_fields=[... , text_col])).
        tables.append(t)
    stacked = pa.concat_tables(tables).combine_chunks()
    if manifest.text_col not in stacked.column_names:
        raise ValueError(
            "compaction needs the text column stored as a fast field "
            f"({manifest.text_col!r}); build with "
            f"fast_fields=[..., {manifest.text_col!r}]"
        )
    # preserve the segment sort when every source shares one (the
    # reference keeps IndexSettings.sort_by_field through merges)
    sorts = {tuple(r.meta.get("sort_by") or ()) for r in readers}
    sort_by = tuple(sorts.pop()) if len(sorts) == 1 and any(sorts) else None
    if sort_by == ():
        sort_by = None
    return build_segment_from_table(
        stacked, new_ord, index_dir,
        text_col=manifest.text_col, id_col=manifest.id_col,
        analyzer=manifest.analyzer,
        record_positions=manifest.record_positions,
        lineage={"compacted_from": sorted(source_ords)},
        fast_fields=[c for c in stacked.column_names
                     if c not in (manifest.id_col,)],
        sort_by=sort_by,
    )


def compact(index_dir: str, policy: Optional[LogMergePolicy] = None) -> Dict:
    """Plan + execute merges; atomically republish the manifest.

    → {"merged_groups": [...], "new_segments": [...]}. Old segment dirs
    are removed after the manifest swap (crash between swap and cleanup
    leaves only orphan dirs, never a broken index)."""
    import ray

    from ..utils import remote_args

    policy = policy or LogMergePolicy()
    manifest = load_manifest(index_dir)
    groups = policy.compute_merge_candidates(manifest.segments)
    if not groups:
        return {"merged_groups": [], "new_segments": []}

    next_ord = max(s["segment_ord"] for s in manifest.segments) + 1

    @ray.remote
    def _merge_one(ords: List[int], new_ord: int) -> Dict:
        return _rebuild_segment(index_dir, ords, new_ord, manifest)

    refs = []
    assignments = []
    for i, g in enumerate(groups):
        refs.append(
            _merge_one.options(**remote_args()).remote(g, next_ord + i))
        assignments.append((g, next_ord + i))
    new_metas = ray.get(refs)

    merged_away = {o for g, _ in assignments for o in g}
    kept = [s for s in manifest.segments
            if s["segment_ord"] not in merged_away]
    manifest.segments = kept + new_metas
    write_manifest(index_dir, manifest)  # atomic swap

    for o in sorted(merged_away):
        shutil.rmtree(os.path.join(index_dir, segment_dir_name(o)),
                      ignore_errors=True)
    return {
        "merged_groups": [g for g, _ in assignments],
        "new_segments": [m["segment_ord"] for m in new_metas],
    }


def garbage_collect(index_dir: str,
                    include_uncommitted: bool = False) -> List[str]:
    """Remove segment directories not referenced by the committed
    manifest (reference: segment_updater.rs GC after merge +
    ManagedDirectory garbage collection — files outside the living set
    are deleted once the new meta.json is durable).

    Live reader generations keep serving through a GC: segment files are
    mmapped, so unlinking only removes the directory entry — an open
    SearcherPool/IndexSearcher holds the inodes until it reloads onto
    the new generation (the reference's warming/generation tracking,
    src/reader/warming.rs).

    By default only dirs with ord <= the manifest's max ord are removed
    (compaction/merge leftovers and crash orphans — a crash between the
    manifest swap and cleanup leaves exactly these).  Dirs with HIGHER
    ords may be a concurrent writer's flushed-but-uncommitted segments;
    pass ``include_uncommitted=True`` to reap those too (only safe when
    no IndexWriter is active, e.g. after a rollback).

    → list of removed directory paths."""
    manifest = load_manifest(index_dir)
    live = {s["segment_ord"] for s in manifest.segments}
    max_ord = max(live) if live else -1
    removed: List[str] = []
    for name in sorted(os.listdir(index_dir)):
        if not name.startswith("seg-"):
            continue
        path = os.path.join(index_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            ord_ = int(name.split("-", 1)[1])
        except ValueError:
            continue
        if ord_ in live:
            continue
        if ord_ > max_ord and not include_uncommitted:
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed
