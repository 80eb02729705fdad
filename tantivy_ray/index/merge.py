"""Segment merge — THE wide step: groupby-term shuffle with head-term salting.

Reference semantics: merging stacks doc ids by segment order (global doc id =
segment base offset + local doc id, /root/reference/src/indexer/merger.rs:
697-708), aligns term streams with a k-way merge (TermMerger,
src/termdict/fst_termdict/merger.rs used at src/indexer/merger.rs:668-675),
and keeps total_num_tokens exact (merger.rs:66-108).

Ray-Data-first shape: instead of iterative pairwise merges, ONE
``groupby(term)`` exchange over posting fragments:

    segments → flat_map(explode per-term fragments) → groupby(group_key)
             → map_groups(stack + re-encode) → term-bucketed parquet

Skew (north rule): web-text term frequencies are Zipfian — "the" appears in
nearly every document, so a naive groupby sends ~N postings to one reducer.
Salting: a term whose per-segment fragment exceeds ``salt_block_docs``
postings is split into multiple (term, salt) sub-fragments; the salt id is
ordered by (segment_ord, position), so a term's full merged posting list is
the concatenation of its salted parts in salt order — provably equivalent
because the parts cover disjoint, ascending global-doc-id ranges (doc ids
are stacked by segment order, and salts split a segment's already-sorted
list into contiguous runs).

Output layout (resumable, term-partitioned):
    merged_dir/
        parts/bucket=BB/*.parquet   (term, salt, doc_freq, first_doc,
                                     last_doc, postings: binary blob)
        term_stats.parquet          (term, doc_freq)  — global df table
        merged_meta.json
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..bm25 import compute_tf_cache
from .compression import TermPostingsReader, encode_term_postings
from .manifest import load_manifest
from .segment import SegmentReader, segment_dir_name

DEFAULT_SALT_BLOCK_DOCS = 65_536  # max postings per (term, salt) sub-group
DEFAULT_NUM_BUCKETS = 64


class ExplodeSegment:
    """flat_map stage: one segment → per-(term, salt) posting fragments."""

    def __init__(self, index_dir: str, salt_block_docs: int, num_buckets: int):
        self.index_dir = index_dir
        self.salt_block_docs = salt_block_docs
        self.num_buckets = num_buckets
        self._doc_base: Optional[Dict[int, int]] = None

    def _doc_bases(self) -> Dict[int, int]:
        if self._doc_base is None:
            manifest = load_manifest(self.index_dir)
            base = 0
            bases = {}
            for s in manifest.segments:
                bases[s["segment_ord"]] = base
                base += s["num_docs"]
            self._doc_base = bases
        return self._doc_base

    def __call__(self, batch: pd.DataFrame) -> Iterator[pd.DataFrame]:
        bases = self._doc_bases()
        for seg_ord in batch["segment_ord"]:
            seg_ord = int(seg_ord)
            reader = SegmentReader(
                os.path.join(self.index_dir, segment_dir_name(seg_ord))
            )
            base = bases[seg_ord]
            rows = {k: [] for k in (
                "group_key", "term", "salt", "doc_freq",
                "first_doc", "last_doc", "docs", "tfs", "fids",
            )}
            alive = reader.alive_mask
            for term in reader.terms():
                docs, tfs = reader.postings(term)
                if alive is not None and len(docs):
                    keep = alive[docs]
                    docs, tfs = docs[keep], tfs[keep]
                    if len(docs) == 0:
                        continue
                fids = reader.fieldnorm_ids[docs]
                gdocs = docs.astype(np.int64) + base
                # salt = global-doc-range bucket: fragments of the same term
                # from different segments share a salt iff they fall in the
                # same doc-range span, so a reducer merges ~span/segment_size
                # fragments; head terms spread over many salts (bounded
                # reducer input), tail terms collapse to one group.  Salt
                # order == global doc order, so concatenation by salt
                # reconstructs the full list (disjoint ascending ranges).
                for start in range(0, len(gdocs), self.salt_block_docs):
                    end = min(start + self.salt_block_docs, len(gdocs))
                    chunk = gdocs[start:end]
                    salt = int(chunk[0]) // max(1, self.salt_block_docs)
                    rows["group_key"].append(f"{term}\x00{salt:012d}")
                    rows["term"].append(term)
                    rows["salt"].append(salt)
                    rows["doc_freq"].append(end - start)
                    rows["first_doc"].append(int(chunk[0]))
                    rows["last_doc"].append(int(chunk[-1]))
                    rows["docs"].append(chunk.astype(np.int64).tobytes())
                    rows["tfs"].append(tfs[start:end].tobytes())
                    rows["fids"].append(fids[start:end].tobytes())
            if rows["term"]:
                yield pd.DataFrame(rows)


def _merge_group(g: pd.DataFrame, avg_fieldnorm: float) -> pd.DataFrame:
    """Reduce one (term, salt) group: stack fragments from all segments in
    ascending global-doc order and re-encode the packed blob."""
    g = g.sort_values("first_doc")
    docs = np.concatenate([
        np.frombuffer(b, dtype=np.int64) for b in g["docs"]
    ])
    tfs = np.concatenate([np.frombuffer(b, dtype=np.uint32) for b in g["tfs"]])
    fids = np.concatenate([np.frombuffer(b, dtype=np.uint8) for b in g["fids"]])
    # ranges are disjoint and each sorted → concat in first_doc order is sorted
    assert (np.diff(docs) > 0).all(), "overlapping salted fragments"
    cache = compute_tf_cache(np.float32(avg_fieldnorm))
    # fids are already posting-aligned; a doc-indexed dense array here
    # would be an O(global-corpus-size) allocation per term group
    blob = encode_term_postings(
        docs.astype(np.uint32), tfs, fids, cache, fids_per_posting=True
    )
    term = g["term"].iloc[0]
    return pd.DataFrame({
        "term": [term],
        "salt": [int(g["salt"].min())],
        "doc_freq": [len(docs)],
        "first_doc": [int(docs[0])],
        "last_doc": [int(docs[-1])],
        "postings": [blob],
    })


def merge_segments(
    index_dir: str,
    merged_dir: str,
    salt_block_docs: int = DEFAULT_SALT_BLOCK_DOCS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> Dict:
    """Run the groupby-term merge. Returns merged meta dict."""
    import ray.data as rd

    from ..utils import remote_args

    manifest = load_manifest(index_dir)
    avg = manifest.average_fieldnorm
    os.makedirs(merged_dir, exist_ok=True)

    segs = rd.from_items([
        {"segment_ord": s["segment_ord"]} for s in manifest.segments
    ])
    fragments = segs.map_batches(
        ExplodeSegment(index_dir, salt_block_docs, num_buckets),
        batch_size=1,
        batch_format="pandas",
        **remote_args(),
    )

    # coalesce fragment blocks before the shuffle: the sort exchange's
    # fixed cost scales with block count, so target ~64 MB blocks (bounded
    # below so small test indexes don't pay 74-block orchestration)
    total_bytes = sum(
        s.get("metrics", {}).get("postings_bytes", 0) for s in manifest.segments
    )
    n_shuffle_blocks = int(min(1024, max(8, total_bytes // (64 << 20))))
    fragments = fragments.repartition(n_shuffle_blocks)

    merged = fragments.groupby("group_key").map_groups(
        lambda g: _merge_group(g, avg),
        batch_format="pandas",
        **remote_args(),
    )

    # bucket by term hash for term-partitioned, prunable output files
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        df = df.copy()
        df["bucket"] = [
            zlib.crc32(t.encode()) % num_buckets for t in df["term"]
        ]
        return df

    out = merged.map_batches(add_bucket, batch_format="pandas", **remote_args())
    out.write_parquet(
        os.path.join(merged_dir, "parts"), partition_cols=["bucket"]
    )

    # global term stats (tiny groupby over (term, doc_freq) rows)
    import pyarrow.parquet as pq

    stats_ds = rd.read_parquet(
        os.path.join(merged_dir, "parts"), columns=["term", "doc_freq"]
    )
    from ray.data.aggregate import Sum

    stats = stats_ds.groupby("term").aggregate(Sum("doc_freq", alias_name="doc_freq"))
    stats_tbl = pa.Table.from_pandas(
        stats.to_pandas().sort_values("term").reset_index(drop=True),
        preserve_index=False,
    )
    pq.write_table(stats_tbl, os.path.join(merged_dir, "term_stats.parquet"))

    meta = {
        "source_index": index_dir,
        "num_terms": int(stats_tbl.num_rows),
        "total_num_docs": manifest.total_num_docs,
        "total_num_tokens": manifest.total_num_tokens,
        "salt_block_docs": salt_block_docs,
        "num_buckets": num_buckets,
    }
    tmp = os.path.join(merged_dir, "merged_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(merged_dir, "merged_meta.json"))
    return meta


class MergedSearcher:
    """BM25 top-k served from the term-partitioned merged output.

    Postings come from the merged super-segments (already global doc ids,
    bucket-pruned reads); fieldnorms and global stats come from the source
    index.  Results are identical to IndexSearcher over the unmerged
    segments (same postings, same f32 kernel) — the demonstration that
    the wide groupby-term merge yields a servable index."""

    def __init__(self, merged_dir: str, index_dir: str):
        from ..search.searcher import IndexSearcher

        self.reader = MergedIndexReader(merged_dir)
        self._src = IndexSearcher(index_dir)
        self._gv = self._src._global_view()
        self.total_num_docs = self._src.total_num_docs
        self.average_fieldnorm = self._src.average_fieldnorm

    def search(self, terms, mode: str = "or", k: int = 10):
        from ..search.searcher import merge_topk

        terms = list(terms)
        dfs = {t: self.reader.doc_freq(t) for t in terms}
        weights = self._src.make_weights(terms, dfs)
        gv = self._gv
        n = int(gv["bases"][-1])
        fids = gv["fids"]
        acc = np.zeros(n, dtype=np.float32)
        cnt = np.zeros(n, dtype=np.int32)
        n_present = 0
        for t, w in zip(terms, weights):
            p = self.reader.postings(t)
            if p is None:
                continue
            n_present += 1
            docs, tfs = p
            acc[docs] += w.score(fids[docs], tfs)
            cnt[docs] += 1
        if mode == "and":
            if n_present < len(terms):
                return []
            cand = np.flatnonzero(cnt == len(terms))
        else:
            cand = np.flatnonzero(cnt > 0)
        if len(cand) == 0:
            return []
        scores = acc[cand]
        if len(cand) > k:
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        cand, scores = cand[order], scores[order]
        seg_of = np.searchsorted(gv["bases"], cand, side="right") - 1
        ords = [r.segment_ord for r in self._src.readers]
        return [
            (float(s), ords[int(si)], int(d - gv["bases"][int(si)]))
            for s, si, d in zip(scores, seg_of, cand)
        ]


class MergedIndexReader:
    """Lookup over the merged, term-partitioned postings (bucket pruning:
    only the term's hash bucket is read)."""

    def __init__(self, merged_dir: str):
        import pyarrow.parquet as pq

        self.merged_dir = merged_dir
        with open(os.path.join(merged_dir, "merged_meta.json")) as f:
            self.meta = json.load(f)
        self._stats = pq.read_table(
            os.path.join(merged_dir, "term_stats.parquet")
        )
        self._df = dict(zip(
            self._stats.column("term").to_pylist(),
            self._stats.column("doc_freq").to_pylist(),
        ))

    def doc_freq(self, term: str) -> int:
        return int(self._df.get(term, 0))

    def postings(self, term: str):
        """→ (global_docs, tfs) or None; reads only the term's bucket."""
        import pyarrow.dataset as pads
        import zlib

        if term not in self._df:
            return None
        bucket = zlib.crc32(term.encode()) % self.meta["num_buckets"]
        dset = pads.dataset(
            os.path.join(self.merged_dir, "parts", f"bucket={bucket}")
        )
        t = dset.to_table(filter=pads.field("term") == term)
        if t.num_rows == 0:
            return None
        rows = sorted(
            zip(t.column("first_doc").to_pylist(),
                t.column("postings").to_pylist()),
        )
        docs_parts, tf_parts = [], []
        for _, blob in rows:
            r = TermPostingsReader(np.frombuffer(blob, dtype=np.uint8))
            d, tf = r.decode_all()
            docs_parts.append(d)
            tf_parts.append(tf)
        return np.concatenate(docs_parts), np.concatenate(tf_parts)
