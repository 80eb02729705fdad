"""IndexWriter facade — the reference's add_document / commit surface.

Mirrors tantivy's ``IndexWriter`` usage (reference src/indexer/
index_writer.rs: bounded ingest queue :40, add_document :727, commit
:664) on top of our partition-per-segment build:

- ``add_document(dict)`` buffers rows; when the buffer reaches
  ``docs_per_segment`` a segment build is dispatched (the arena-flush
  analog — here the partition IS the memory bound);
- ``commit()`` seals remaining rows and atomically publishes the manifest
  (the reference's atomic meta.json rename);
- ``delete_by_term(term)`` mirrors the delete queue: applied against the
  committed segments at the next commit (tombstones, see deletes.py);
- ``rollback()`` drops uncommitted buffered rows (reference opstamp
  rollback — uncommitted adds vanish).

Segment ordinals continue from the highest committed ordinal, so repeated
add/commit cycles append segments exactly like the reference's writer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import pyarrow as pa

from ..index.deletes import delete_by_term as _delete_by_term
from ..index.manifest import (
    IndexManifest,
    completed_segment_ords,
    load_manifest,
    write_manifest,
)
from ..index.segment import build_segment_from_table


class IndexWriter:
    def __init__(self, index_dir: str, text_col: str = "text",
                 id_col: str = "url", analyzer: str = "default",
                 record_positions: bool = False,
                 docs_per_segment: int = 100_000,
                 fast_fields: Optional[List[str]] = None):
        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = analyzer
        self.record_positions = record_positions
        self.docs_per_segment = docs_per_segment
        self.fast_fields = fast_fields
        os.makedirs(index_dir, exist_ok=True)
        self._buffer: List[Dict] = []
        self._pending_deletes: List[tuple] = []
        self._uncommitted_ords: List[int] = []
        done = completed_segment_ords(index_dir)
        self._next_ord = max(done) + 1 if done else 0
        # monotonic opstamps (reference index_writer.rs: every queued op
        # gets a strictly increasing stamp; commit() returns the stamp of
        # the last op made durable).  Resumes continue past the last
        # committed stamp recorded in the manifest.
        self._opstamp = self._load_committed_opstamp()
        self._committed_opstamp = self._opstamp

    def _load_committed_opstamp(self) -> int:
        import json as _json

        p = os.path.join(self.index_dir, "manifest.json")
        if os.path.exists(p):
            with open(p) as f:
                return int(_json.load(f).get("opstamp", 0))
        return 0

    @property
    def opstamp(self) -> int:
        """Stamp of the most recently queued operation."""
        return self._opstamp

    @property
    def committed_opstamp(self) -> int:
        return self._committed_opstamp

    # --- ingestion ---
    def add_document(self, doc: Dict) -> int:
        self._opstamp += 1
        self._buffer.append(doc)
        if len(self._buffer) >= self.docs_per_segment:
            self._flush()
        return self._opstamp

    def add_documents(self, docs) -> None:
        for d in docs:
            self.add_document(d)

    def _queue_delete(self, op: str, arg) -> int:
        # opstamp ordering (reference index_writer.rs): a delete applies
        # only to documents added BEFORE it.  Seal the buffered adds now
        # and record the segment-ord horizon — at commit the delete
        # touches only segments with ord < horizon, so docs added after
        # the delete call survive it (delete_all(); add(x); commit()
        # yields {x}, matching the reference).
        self._flush()
        self._opstamp += 1
        self._pending_deletes.append((op, arg, self._next_ord))
        return self._opstamp

    def delete_by_term(self, term: str) -> int:
        return self._queue_delete("term", term)

    def delete_by_query(self, query) -> int:
        """Queue a delete-by-query op (reference delete_query,
        index_writer.rs:698); applied at commit like delete_by_term."""
        return self._queue_delete("query", query)

    def delete_all_documents(self) -> int:
        """Queue deletion of every document (reference
        delete_all_documents, index_writer.rs:522)."""
        return self._queue_delete("all", None)

    def rollback(self) -> int:
        """Drop uncommitted ops; the opstamp rewinds to the last
        committed stamp (reference rollback semantics).  Segments this
        writer flushed since the last commit are removed from disk —
        otherwise the next commit's dir scan would silently resurrect
        rolled-back adds."""
        import shutil

        from ..index.segment import segment_dir_name

        n = len(self._buffer)
        self._buffer.clear()
        self._pending_deletes.clear()
        for o in self._uncommitted_ords:
            shutil.rmtree(os.path.join(self.index_dir, segment_dir_name(o)),
                          ignore_errors=True)
            n += 1  # count rolled-back flushed segments as dropped work
        if self._uncommitted_ords:
            self._next_ord = min(self._uncommitted_ords)
        self._uncommitted_ords = []
        self._opstamp = self._committed_opstamp
        return n

    def _flush(self) -> None:
        if not self._buffer:
            return
        # dedupe: a column may be both text_col and a fast field
        keys = list(dict.fromkeys(
            (self.id_col, self.text_col, *(self.fast_fields or []))))
        cols: Dict[str, list] = {}
        for d in self._buffer:
            for k in keys:
                cols.setdefault(k, []).append(d.get(k))
        table = pa.table(cols)
        build_segment_from_table(
            table, self._next_ord, self.index_dir,
            text_col=self.text_col, id_col=self.id_col,
            analyzer=self.analyzer, record_positions=self.record_positions,
            lineage={"source": "index_writer", "buffered_rows": len(table)},
            fast_fields=self.fast_fields,
        )
        self._uncommitted_ords.append(self._next_ord)
        self._next_ord += 1
        self._buffer.clear()

    # --- commit ---
    def commit(self) -> IndexManifest:
        """Seal buffered docs + publish manifest + apply queued deletes."""
        self._flush()
        metas = completed_segment_ords(self.index_dir)
        manifest = IndexManifest(
            analyzer=self.analyzer,
            text_col=self.text_col,
            id_col=self.id_col,
            record_positions=self.record_positions,
            segments=[metas[o] for o in sorted(metas)],
        )
        write_manifest(self.index_dir, manifest)
        # apply queued deletes BEFORE stamping the opstamp: stamping first
        # would let a crash in between publish a manifest that claims the
        # delete ops durable while their tombstones were never written, and
        # a resumed writer would silently skip them.  This order is safe —
        # a crash after the deletes but before the stamp just re-applies
        # them on resume (delete-by-term is idempotent).
        for op, arg, max_ord in self._pending_deletes:
            if op == "term":
                _delete_by_term(self.index_dir, arg, max_ord=max_ord)
            elif op == "query":
                from ..index.deletes import delete_by_query

                delete_by_query(self.index_dir, arg, max_ord=max_ord)
            else:
                from ..index.deletes import delete_all_documents

                delete_all_documents(self.index_dir, max_ord=max_ord)
        self._pending_deletes.clear()
        # stamp the manifest with the last durable opstamp (atomic: the
        # manifest rewrite below replaces the file written above)
        import json as _json

        p = os.path.join(self.index_dir, "manifest.json")
        with open(p) as f:
            d = _json.load(f)
        d["opstamp"] = self._opstamp
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(d, f, indent=1)
        os.replace(tmp, p)
        self._committed_opstamp = self._opstamp
        self._uncommitted_ords = []
        return load_manifest(self.index_dir)
