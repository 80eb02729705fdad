"""Searcher — BM25 top-k over sealed segments.

Mirrors the reference's read path (SURVEY §3.2): a Searcher is an immutable
snapshot over SegmentReaders (/root/reference/src/core/searcher.rs); a query
builds one Bm25Weight per term from GLOBAL statistics (doc_freq summed over
all segments, total docs / tokens from the manifest —
/root/reference/src/query/bm25.rs:27-50), scores each segment independently,
and merges per-segment top-k with the collector's tie rule: score
descending, then (segment_ord, doc_id) ascending; the heap uses strict `>`
so the lowest DocAddress wins ties
(/root/reference/src/collector/sort_key/mod.rs:20-35).

Two scorer paths, rank-identical by construction and property-tested
against each other (like the reference's proptest on block_wand —
/root/reference/src/query/boolean_query/block_wand_union.rs:293-619):
- exhaustive: fully vectorized numpy accumulation (fast for small/medium
  doc_freq — the default here);
- block-max WAND (wand.py): skips 128-doc blocks whose score bound cannot
  beat the running threshold (the 10^12-doc scale path).

Score arithmetic is f32 end-to-end; per-doc sums add term contributions in
term order (the reference's BufferedUnionScorer accumulates scorers in
order — src/query/union/buffered_union.rs:11-70).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..analyzer import get_analyzer
from ..bm25 import Bm25Weight
from ..index.manifest import IndexManifest, load_manifest
from ..index.segment import SegmentReader, segment_dir_name
from .wand import block_max_wand_intersection_topk, block_max_wand_topk

TopHit = Tuple[float, int, int]  # (score_f32, segment_ord, doc_id)

# below this many total postings the sparse path always wins; above it a
# query touching >1/4 of the doc space takes one dense O(n) pass instead
# of the O(P log P) unique+sort (results identical either way)
_DENSE_CUTOVER_MIN = 4096


def _sparse_accumulate(
    parts: Sequence[Tuple[np.ndarray, np.ndarray]],
    n_docs: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Union-of-candidates BM25 accumulation — the default scorer's core.

    ``parts``: one ``(doc_ids ascending, f32 contributions)`` pair per
    present query term, in QUERY-TERM ORDER.  Returns ``(unique docs
    ascending, f32 score sums, per-doc match counts)``.

    Memory is O(total matched postings), never O(doc space): a rare term
    over a 10^8-doc shard touches only its own candidates, where the old
    dense ``np.zeros(n_docs)`` accumulator paid an alloc+zero+scatter over
    every doc the searcher holds per query.

    f32-exact vs that dense accumulator: each doc's contributions are
    added with sequential in-place f32 adds (``acc[idx] += sc``) in term
    order — the same op order the dense path used (the technique proven in
    search/wand.py).  ``np.add.reduceat`` is deliberately NOT used: it
    accumulates in extended precision and breaks bit-exact parity by 1 ulp.
    """
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32),
                np.empty(0, dtype=np.int32))
    if len(parts) == 1:
        docs, sc = parts[0]
        return docs, sc.astype(np.float32, copy=False), np.ones(
            len(docs), dtype=np.int32)
    total = sum(len(d) for d, _ in parts)
    if n_docs is not None and total > max(_DENSE_CUTOVER_MIN, n_docs // 4):
        # DENSE-QUERY cutover: when the candidate volume approaches the
        # doc space (stop-word-heavy queries), the O(P log P) unique+sort
        # costs more than one O(n) dense pass — and the dense accumulator
        # is then proportional to the output anyway.  Same per-doc f32 op
        # order, so results stay bit-identical to the sparse path.
        acc_d = np.zeros(n_docs, dtype=np.float32)
        cnt_d = np.zeros(n_docs, dtype=np.int32)
        for docs, sc in parts:
            acc_d[docs] += sc
            cnt_d[docs] += 1
        u = np.flatnonzero(cnt_d > 0)
        return u, acc_d[u], cnt_d[u]
    u = np.unique(np.concatenate([d for d, _ in parts]))
    acc = np.zeros(len(u), dtype=np.float32)
    cnt = np.zeros(len(u), dtype=np.int32)
    for docs, sc in parts:
        idx = np.searchsorted(u, docs)
        acc[idx] += sc
        cnt[idx] += 1
    return u, acc, cnt


def merge_topk(hits: Sequence[TopHit], k: int) -> List[TopHit]:
    """merge_fruits: sort (score desc, (seg, doc) asc), truncate k
    (reference src/collector/mod.rs:167-180)."""
    return sorted(hits, key=lambda h: (-h[0], h[1], h[2]))[:k]


class SegmentSearcher:
    """Per-segment scoring (the reference's per-segment collect)."""

    def __init__(self, reader: SegmentReader):
        self.reader = reader

    def score_exhaustive(
        self, terms: Sequence[str], weights: Sequence[Bm25Weight], mode: str
    ) -> Tuple[np.ndarray, np.ndarray]:
        """→ (matching doc ids ascending, f32 scores).

        Candidate-sparse: memory is O(matched postings), never
        O(segment docs) — see ``_sparse_accumulate``."""
        fids = self.reader.fieldnorm_ids
        parts = []
        for term, w in zip(terms, weights):
            p = self.reader.postings(term)
            if p is None:
                continue
            docs, tfs = p
            parts.append((docs, w.score(fids[docs], tfs)))
        if mode == "and" and len(parts) < len(terms):
            return np.empty(0, dtype=np.uint32), np.empty(0, dtype=np.float32)
        cand, scores, nmatch = _sparse_accumulate(parts,
                                                  self.reader.num_docs)
        if mode == "and":
            keep = nmatch == len(terms)
            cand, scores = cand[keep], scores[keep]
        cand = cand.astype(np.uint32)
        alive = self.reader.alive_mask
        if alive is not None and len(cand):
            keep = alive[cand]
            cand, scores = cand[keep], scores[keep]
        return cand, scores

    def topk(
        self,
        terms: Sequence[str],
        weights: Sequence[Bm25Weight],
        mode: str,
        k: int,
        use_wand: bool = False,
    ) -> List[TopHit]:
        if use_wand and mode == "or":
            readers = []
            ws = []
            for term, w in zip(terms, weights):
                r = self.reader.postings_reader(term)
                if r is not None:
                    readers.append(r)
                    ws.append(w)
            if not readers:
                return []
            docs, scores = block_max_wand_topk(
                readers, ws, self.reader.fieldnorm_ids, k,
                alive_mask=self.reader.alive_mask,
            )
        elif use_wand and mode == "and":
            readers = [self.reader.postings_reader(t) for t in terms]
            if any(r is None for r in readers):
                return []  # a missing term empties the intersection
            docs, scores = block_max_wand_intersection_topk(
                readers, list(weights), self.reader.fieldnorm_ids, k,
                alive_mask=self.reader.alive_mask,
            )
        else:
            docs, scores = self.score_exhaustive(terms, weights, mode)
            if len(docs) > k:
                # exact top-k with tie rule: find the kth-largest score, keep
                # everything >= it (ties included), then lexsort that slice
                kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                keep = scores >= kth
                docs, scores = docs[keep], scores[keep]
            order = np.lexsort((docs, -scores))[:k]
            docs, scores = docs[order], scores[order]
        seg = self.reader.segment_ord
        return [(float(s), seg, int(d)) for d, s in zip(docs, scores)]


class IndexSearcher:
    """Snapshot searcher over a set of segments (all by default, or a shard).

    For sharded use the caller must pass global doc_freqs (the shard only
    sees its own segments); with all segments loaded, stats are exact
    locally."""

    def __init__(self, index_dir: str, segment_ords: Optional[Sequence[int]] = None,
                 manifest: Optional[IndexManifest] = None,
                 num_threads: int = 0):
        self.index_dir = index_dir
        self.manifest = manifest or load_manifest(index_dir)
        # per-segment search parallelism INSIDE this searcher (reference
        # Executor::ThreadPool, src/core/executor.rs:32-37: one task per
        # segment).  0/1 = serial.  numpy kernels release the GIL, so
        # threads overlap the scoring work on many-segment indexes.
        self.num_threads = int(num_threads)
        self._seg_pool = None
        ords = (
            [s["segment_ord"] for s in self.manifest.segments]
            if segment_ords is None
            else list(segment_ords)
        )
        # ascending ords are a structural invariant: _search_global's
        # tie-break (global doc order == DocAddress order) and the
        # per-segment merge_topk path must agree on segment order
        ords.sort()
        self.readers = [
            SegmentReader(os.path.join(index_dir, segment_dir_name(o)))
            for o in ords
        ]
        self.searchers = [SegmentSearcher(r) for r in self.readers]
        self.total_num_docs = self.manifest.total_num_docs
        self.average_fieldnorm = np.float32(
            np.float32(self.manifest.total_num_tokens)
            / np.float32(max(1, self.manifest.total_num_docs))
        )

    # --- global (cross-segment) view: used by the exhaustive fast path ---
    def _global_view(self):
        """Concatenated fieldnorms/alive + segment doc-id bases, built once.

        Scoring over ONE global array replaces a python loop over hundreds
        of segments; global doc order == (segment_ord, doc_id) order, so
        tie-breaks are unchanged."""
        gv = getattr(self, "_gv", None)
        if gv is None:
            bases = np.zeros(len(self.readers) + 1, dtype=np.int64)
            for i, r in enumerate(self.readers):
                bases[i + 1] = bases[i] + r.num_docs
            fids = (np.concatenate([r.fieldnorm_ids for r in self.readers])
                    if self.readers else np.empty(0, np.uint8))
            if any(r.alive_mask is not None for r in self.readers):
                alive = np.concatenate([
                    r.alive_mask if r.alive_mask is not None
                    else np.ones(r.num_docs, dtype=bool)
                    for r in self.readers
                ])
            else:
                alive = None
            gv = self._gv = {
                "bases": bases, "fids": fids, "alive": alive, "post": {}
            }
        return gv

    def _global_postings(self, term: str):
        """(global_docs int64 asc, tfs) concatenated across segments."""
        gv = self._global_view()
        hit = gv["post"].get(term)
        if hit is not None:
            return hit
        parts_d, parts_t = [], []
        for i, r in enumerate(self.readers):
            p = r.postings(term)
            if p is None:
                continue
            parts_d.append(p[0].astype(np.int64) + gv["bases"][i])
            parts_t.append(p[1])
        if parts_d:
            out = (np.concatenate(parts_d), np.concatenate(parts_t))
        else:
            out = None
        if len(gv["post"]) > 512:
            gv["post"].pop(next(iter(gv["post"])))
        gv["post"][term] = out
        return out

    # --- stats ---
    def doc_freq(self, term: str) -> int:
        return sum(r.doc_freq(term) for r in self.readers)

    def doc_freqs(self, terms: Sequence[str]) -> Dict[str, int]:
        return {t: self.doc_freq(t) for t in terms}

    def make_weights(
        self, terms: Sequence[str], doc_freqs: Optional[Dict[str, int]] = None,
        boosts: Optional[Sequence[float]] = None,
    ) -> List[Bm25Weight]:
        dfs = doc_freqs or self.doc_freqs(terms)
        ws = []
        for i, t in enumerate(terms):
            df = dfs.get(t, 0)
            w = Bm25Weight.for_one_term(
                max(df, 1) if df else 1, self.total_num_docs, self.average_fieldnorm
            ) if df > 0 else Bm25Weight.for_one_term(1, self.total_num_docs, self.average_fieldnorm)
            if boosts is not None and boosts[i] != 1.0:
                w = w.boost_by(boosts[i])
            ws.append(w)
        return ws

    # --- queries ---
    def search(
        self,
        terms: Sequence[str],
        mode: str = "or",
        k: int = 10,
        doc_freqs: Optional[Dict[str, int]] = None,
        use_wand: bool = False,
    ) -> List[TopHit]:
        """Pre-analyzed terms → global top-k (rank-identical semantics)."""
        terms = list(terms)
        if not terms:
            return []
        weights = self.make_weights(terms, doc_freqs)
        if not use_wand and len(self.readers) > 1:
            return self._search_global(terms, weights, mode, k)
        hits: List[TopHit] = []
        for seg_hits in self._map_searchers(
                lambda s: s.topk(terms, weights, mode, k,
                                 use_wand=use_wand)):
            hits.extend(seg_hits)
        return merge_topk(hits, k)

    def _executor(self):
        """Lazy per-searcher thread pool (reference executor.rs:32-37);
        None when serial."""
        if self.num_threads > 1 and self._seg_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._seg_pool = ThreadPoolExecutor(
                max_workers=self.num_threads,
                thread_name_prefix="seg-search")
        return self._seg_pool

    def _map_searchers(self, fn):
        """fn over every SegmentSearcher, in segment order — threaded
        when num_threads > 1, else a plain loop.  Per-segment results
        are independent; the deterministic merge happens downstream."""
        pool = self._executor()
        if pool is None:
            return [fn(s) for s in self.searchers]
        return list(pool.map(fn, self.searchers))

    def _search_global(self, terms, weights, mode: str, k: int) -> List[TopHit]:
        """Candidate-sparse scoring over the concatenated global doc space —
        identical results to per-segment scoring + merge (same f32 ops per
        doc in term order; global doc order == DocAddress order).

        Memory: O(matched postings) for the query — a rare term over a
        shard of 10^8 docs touches only its candidates; the dense
        O(shard-docs) accumulator this replaces paid ~0.5 GB of zeroed +
        scattered memory per query at that scale."""
        gv = self._global_view()
        fids = gv["fids"]
        n_present = 0
        parts = []
        for term, w in zip(terms, weights):
            p = self._global_postings(term)
            if p is None:
                continue
            n_present += 1
            docs, tfs = p
            parts.append((docs, w.score(fids[docs], tfs)))
        if mode == "and" and n_present < len(terms):
            return []
        cand, scores, nmatch = _sparse_accumulate(
            parts, int(gv["bases"][-1]))
        if mode == "and":
            keep = nmatch == len(terms)
            cand, scores = cand[keep], scores[keep]
        if gv["alive"] is not None and len(cand):
            keep = gv["alive"][cand]
            cand, scores = cand[keep], scores[keep]
        if len(cand) == 0:
            return []
        if len(cand) > k:
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            keep = scores >= kth
            cand, scores = cand[keep], scores[keep]
        order = np.lexsort((cand, -scores))[:k]
        cand, scores = cand[order], scores[order]
        seg_of = np.searchsorted(gv["bases"], cand, side="right") - 1
        ords = [r.segment_ord for r in self.readers]
        return [
            (float(s), ords[int(si)], int(d - gv["bases"][int(si)]))
            for s, si, d in zip(scores, seg_of, cand)
        ]

    def search_text(self, query: str, mode: str = "or", k: int = 10,
                    use_wand: bool = False) -> List[TopHit]:
        ana = get_analyzer(self.manifest.analyzer)
        terms = [t.text for t in ana.analyze(query)]
        return self.search(terms, mode, k, use_wand=use_wand)

    def field_average_fieldnorms(self) -> Dict[str, float]:
        """Per-extra-field avg fieldnorm: Σ field tokens / total docs
        (global, from per-segment field_stats)."""
        out: Dict[str, float] = {}
        totals: Dict[str, int] = {}
        for s in self.manifest.segments:
            for f, n in (s.get("field_stats") or {}).items():
                totals[f] = totals.get(f, 0) + int(n)
        for f, n in totals.items():
            out[f] = float(np.float32(np.float32(n) / np.float32(
                max(1, self.total_num_docs))))
        return out

    def resolve_doc_keys(self, pairs, id_col: str = "doc_id") -> List:
        """Original doc keys for (segment_ord, local_doc_id) pairs.

        Loads the doc-key store ONLY for segments that actually appear
        in ``pairs`` — top-k results touch a handful of segments, so the
        driver never materializes the whole corpus's key stores."""
        needed = {int(seg) for seg, _ in pairs}
        key_of = {
            r.segment_ord: r.doc_keys().column(id_col).to_numpy()
            for r in self.readers if r.segment_ord in needed
        }
        return [key_of[int(seg)][int(doc)] for seg, doc in pairs]

    def search_query(self, query, k: int = 10,
                     doc_freq_of=None) -> List[TopHit]:
        """Evaluate a Query AST (search.query) with global stats."""
        from .query import evaluate_topk

        flat = self._flat_bool_terms(query)
        if flat is not None and len(self.readers) > 1:
            # vectorized cross-segment pass for flat term booleans (the
            # python-glue per-segment evaluator loop is the many-segment
            # latency killer; the reference fans rayon tasks per segment,
            # executor.rs:32-37 — the Ray-side answer is ONE global
            # candidate-sparse pass, identical results by the existing
            # search()/search_query parity tests)
            terms, mode = flat
            return self.search(terms, mode, k,
                               doc_freqs=({t: doc_freq_of(t) for t in terms}
                                          if doc_freq_of else None))
        # lazy per-reader caches (term tables, fieldnorms) are loaded
        # idempotently — a concurrent first touch from two segment tasks
        # just builds the same array twice — so threading is safe
        return evaluate_topk(
            self.readers, query, self.total_num_docs,
            self.average_fieldnorm, k,
            doc_freq_of=doc_freq_of or self.doc_freq,
            field_avgs=self.field_average_fieldnorms(),
            pool=self._executor(),
        )

    @staticmethod
    def _flat_bool_terms(query):
        """(terms, mode) when a Query is a flat primary-field term
        disjunction/conjunction equivalent to ``search(terms, mode)``;
        None otherwise."""
        from .query import BooleanQuery, TermQuery

        if not isinstance(query, BooleanQuery) or query.must_not:
            return None
        if query.must and not query.should:
            clauses, mode = query.must, "and"
        elif query.should and not query.must \
                and query.minimum_should_match <= 1:
            clauses, mode = query.should, "or"
        else:
            return None
        if all(isinstance(c, TermQuery) and c.field is None
               for c in clauses):
            return [c.term for c in clauses], mode
        return None

    def search_phrase(self, terms: Sequence[str], k: int = 10,
                      slop: int = 0) -> List[TopHit]:
        from .query import PhraseQuery

        return self.search_query(PhraseQuery(list(terms), slop), k)

    def parse_and_search(self, query_text: str, k: int = 10) -> List[TopHit]:
        from .queryparser import QueryParser

        q = QueryParser(analyzer=self.manifest.analyzer).parse(query_text)
        return self.search_query(q, k)

    def explain(self, terms: Sequence[str], segment_ord: int, doc_id: int,
                doc_freqs: Optional[Dict[str, int]] = None) -> Dict:
        """Score explanation for one document — the reference's
        ``Query::explain`` / ``Explanation`` tree (src/query/query.rs:138,
        src/query/explanation.rs; Bm25Weight::explain bm25.rs): per-term
        idf·(k1+1) weight and tf/(tf+norm) factors, summed in term order
        with the same f32 arithmetic as ``search`` — the root ``value``
        is bit-identical to the hit's score."""
        from ..fieldnorm import FIELD_NORMS_TABLE

        reader = next(r for r in self.readers
                      if r.segment_ord == segment_ord)
        weights = self.make_weights(list(terms), doc_freqs)
        dfs = doc_freqs or self.doc_freqs(list(terms))
        fid = int(reader.fieldnorm_ids[doc_id])
        total = np.float32(0.0)
        details = []
        for term, w in zip(terms, weights):
            p = reader.postings(term)
            if p is None:
                continue
            docs, tfs = p
            i = int(np.searchsorted(docs, doc_id))
            if i >= len(docs) or int(docs[i]) != doc_id:
                continue
            tf = int(tfs[i])
            contrib = w.score(np.array([fid], dtype=np.uint8),
                              np.array([tf], dtype=np.uint32))[0]
            total = np.float32(total + contrib)
            norm = float(w.cache[fid])
            details.append({
                "value": float(contrib),
                "description": f"TermQuery, product of idf*(k1+1) and "
                               f"tf/(tf + k1*(1-b+b*|d|/avg)) for "
                               f"term={term!r}",
                "details": [
                    {"value": float(w.weight),
                     "description": f"idf*(k1+1), doc_freq={dfs.get(term, 0)}"
                                    f", total_docs={self.total_num_docs}"},
                    {"value": float(tf), "description": "term frequency"},
                    {"value": float(FIELD_NORMS_TABLE[fid]),
                     "description": f"fieldnorm (decoded, id={fid})"},
                    {"value": norm,
                     "description": "k1*(1 - b + b*fieldnorm/avg_fieldnorm)"},
                ],
            })
        return {
            "value": float(total),
            "description": "sum of term scores (BM25, f32, term order)",
            "details": details,
        }

    def hydrate(self, hits: Sequence[TopHit]):
        """(score, seg, doc) → list of dicts with the stored id column."""
        out = []
        by_seg: Dict[int, List[Tuple[int, int]]] = {}
        for i, (_, seg, doc) in enumerate(hits):
            by_seg.setdefault(seg, []).append((i, doc))
        id_col = self.manifest.id_col
        keys: Dict[int, str] = {}
        seg_of = {r.segment_ord: r for r in self.readers}
        for seg, items in by_seg.items():
            t = seg_of[seg].doc_keys()
            vals = t.column(id_col)
            for i, doc in items:
                keys[i] = vals[doc].as_py()
        for i, (score, seg, doc) in enumerate(hits):
            out.append({
                "score": score, "segment_ord": seg, "doc_id": doc,
                id_col: keys[i],
            })
        return out
