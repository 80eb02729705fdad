"""Distributed index build — Ray Data pipeline.

Shape (SURVEY §3.1 → Ray): the reference's worker threads + arena + flush
become *partition descriptors* → ``map_batches(build_segment)`` — each task
reads ONLY its own parquet row groups (column-pruned), tokenizes, inverts and
seals one segment; the driver then writes the manifest atomically.

Why descriptor-driven instead of a bare ``read_parquet``: doc ids must be
deterministic across retries and parallelism levels (north rule: derive from
(file, row offset), never from task scheduling — SURVEY §7.4.4), and resume
must be able to skip finished partitions.  Partition boundaries are computed
once from parquet metadata (row counts only — cheap), so the same input
always yields the same (segment_ord ↔ row range) mapping at ANY cluster
size; at 100 TB each task still only touches its own byte ranges.

Resume: a segment directory with meta.json present is sealed and skipped;
anything else is rebuilt (meta.json is written last by the build task).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import IndexManifest, completed_segment_ords, write_manifest
from .segment import build_segment_from_table


def _to_py(obj):
    """Recursively convert numpy containers/scalars to plain python (Ray's
    batch formats wrap nested values in ndarrays)."""
    import numpy as np

    if isinstance(obj, np.ndarray):
        return [_to_py(x) for x in obj.tolist()] if obj.dtype == object else obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, dict):
        return {k: _to_py(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_py(x) for x in obj]
    return obj

DEFAULT_DOCS_PER_SEGMENT = 100_000


def plan_partitions(
    input_paths: Sequence[str],
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
) -> List[Dict]:
    """Deterministic partition plan from parquet row-group metadata.

    Row groups are assigned greedily (in sorted-file, row-group order) to
    partitions of ~docs_per_segment docs.  A row group larger than the
    target is split by row range (each slice task reads the row group and
    slices — at production row-group sizes (~128 MB) the target should
    exceed the row-group size so this path is test-scale only)."""
    parts: List[Dict] = []
    cur_rgs: List[Dict] = []
    cur_rows = 0

    def seal():
        nonlocal cur_rgs, cur_rows
        if cur_rgs:
            parts.append({
                "segment_ord": len(parts),
                "row_groups": cur_rgs,
                "num_rows": cur_rows,
            })
            cur_rgs, cur_rows = [], 0

    for path in sorted(input_paths):
        md = pq.read_metadata(path)
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            if n > docs_per_segment:
                seal()
                for start in range(0, n, docs_per_segment):
                    end = min(start + docs_per_segment, n)
                    cur_rgs = [{
                        "file": path, "row_group": rg, "num_rows": end - start,
                        "row_start": start, "row_end": end,
                    }]
                    cur_rows = end - start
                    seal()
                continue
            if cur_rows > 0 and cur_rows + n > docs_per_segment:
                seal()
            cur_rgs.append({"file": path, "row_group": rg, "num_rows": n})
            cur_rows += n
    seal()
    return parts


class BuildSegmentTask:
    """Actor-pool / task body: one partition descriptor → one sealed segment.

    Stateless apart from config; safe to retry (build is deterministic and
    meta.json is written last)."""

    def __init__(self, index_dir: str, text_col: str, id_col: str,
                 analyzer: str, record_positions: bool, columns: List[str],
                 fast_fields: Optional[List[str]] = None,
                 extra_text_fields: Optional[Dict[str, str]] = None,
                 sort_by=None, transform=None):
        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer
        self.record_positions = record_positions
        self.columns = columns
        self.fast_fields = fast_fields or []
        self.extra_text_fields = extra_text_fields or {}
        self.sort_by = sort_by
        self.transform = transform

    def build_one(self, part: Dict) -> Dict:
        part = _to_py(part)
        # failpoint (reference tests/failpoints/ via the `fail` crate): a
        # marker file injects exactly one failure for a segment, proving
        # retries re-execute deterministically
        fp = os.path.join(
            self.index_dir, f".failpoint_once_{part['segment_ord']}")
        if os.path.exists(fp):
            os.remove(fp)
            raise RuntimeError(
                f"failpoint: injected failure for segment {part['segment_ord']}")
        rgs = part["row_groups"]
        tables = []
        for rg in rgs:
            f = pq.ParquetFile(rg["file"])
            t = f.read_row_groups([rg["row_group"]], columns=self.columns)
            if "row_start" in rg:
                t = t.slice(rg["row_start"], rg["row_end"] - rg["row_start"])
            tables.append(t)
        table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        table = table.combine_chunks()
        if self.transform is not None:
            # derivation stage (e.g. JSON flatten, numeric term encode)
            # runs INSIDE the build task on its own partition — the
            # derived columns never exist as a whole dataset anywhere
            table = self.transform(table).combine_chunks()
        lineage = {
            "row_groups": rgs,
            "num_rows": part["num_rows"],
        }
        return build_segment_from_table(
            table,
            segment_ord=part["segment_ord"],
            out_dir=self.index_dir,
            text_col=self.text_col,
            id_col=self.id_col,
            analyzer=self.analyzer,
            record_positions=self.record_positions,
            lineage=lineage,
            fast_fields=self.fast_fields,
            extra_text_fields=self.extra_text_fields,
            sort_by=self.sort_by,
        )

    def __call__(self, batch: Dict) -> Dict:
        import numpy as np

        metas = []
        n = len(batch["segment_ord"])
        for i in range(n):
            part = {
                "segment_ord": int(batch["segment_ord"][i]),
                "row_groups": batch["row_groups"][i],
                "num_rows": int(batch["num_rows"][i]),
            }
            meta = self.build_one(part)
            metas.append(meta)
        return {
            "segment_ord": np.array([m["segment_ord"] for m in metas]),
            "num_docs": np.array([m["num_docs"] for m in metas]),
            "num_tokens": np.array([m["num_tokens"] for m in metas]),
            "num_terms": np.array([m["num_terms"] for m in metas]),
        }


def build_index(
    input_paths: Sequence[str] | str,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "url",
    analyzer: str = "default",
    record_positions: bool = False,
    docs_per_segment: int = DEFAULT_DOCS_PER_SEGMENT,
    concurrency: Optional[int] = None,
    resume: bool = True,
    fast_fields: Optional[List[str]] = None,
    extra_text_fields: Optional[Dict[str, str]] = None,
    sort_by=None,
    transform=None,
    source_columns: Optional[List[str]] = None,
) -> IndexManifest:
    """Build (or resume) an index over parquet inputs with Ray Data.

    Wide shape: N partition descriptors stream through ``map_batches`` (one
    descriptor per task, ``batch_size=1``) — the streaming executor schedules
    and retries; no all-to-all shuffle is needed for the build itself (the
    groupby-term merge is a separate operator, see merge.py)."""
    import ray.data as rd

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    os.makedirs(index_dir, exist_ok=True)

    parts = plan_partitions(input_paths, docs_per_segment)
    done = completed_segment_ords(index_dir) if resume else {}
    todo = [p for p in parts if p["segment_ord"] not in done]

    if todo:
        # with a transform, the parquet read set is the transform's INPUT
        # columns (source_columns) — text_col/extra fields may be derived
        columns = (sorted(source_columns) if source_columns is not None
                   else sorted({id_col, text_col, *(fast_fields or []),
                                *(extra_text_fields or {}),
                                *((sort_by[0],) if sort_by else ())}))
        task = BuildSegmentTask(
            index_dir, text_col, id_col, analyzer, record_positions,
            columns=columns,
            fast_fields=fast_fields,
            extra_text_fields=extra_text_fields,
            sort_by=sort_by,
            transform=transform,
        )
        ds = rd.from_items(
            [
                {
                    "segment_ord": p["segment_ord"],
                    "row_groups": p["row_groups"],
                    "num_rows": p["num_rows"],
                }
                for p in todo
            ]
        )
        from ..utils import remote_args

        # one partition per task; plain tasks (analyzer init is cheap,
        # SURVEY §2.3) — batch_size=1 keeps a task's memory = one partition.
        # retry_exceptions: transient task failures re-execute; builds are
        # deterministic so retries are byte-identical (SURVEY §4 stragglers)
        out = ds.map_batches(
            task, batch_size=1, batch_format="numpy",
            retry_exceptions=True, max_retries=3, **remote_args()
        )
        out.materialize()  # small: one row per segment

    metas = completed_segment_ords(index_dir)
    missing = [p["segment_ord"] for p in parts if p["segment_ord"] not in metas]
    if missing:
        raise RuntimeError(f"segments failed to seal: {missing}")

    manifest = IndexManifest(
        analyzer=analyzer,
        text_col=text_col,
        id_col=id_col,
        record_positions=record_positions,
        segments=[metas[p["segment_ord"]] for p in parts],
    )
    write_manifest(index_dir, manifest)
    return manifest
