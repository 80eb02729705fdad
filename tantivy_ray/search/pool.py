"""SearcherPool — a persistent replicated searcher actor pool.

The reference's serving shape is a LONG-LIVED Searcher over mmapped
segments (startup <10 ms, README.md:34; rayon pool per search,
src/core/executor.rs:32-37): the index is opened once and query batches
arrive repeatedly.  Ray Data's `map_batches(Cls, concurrency=N)` actor
pools are scoped to ONE dataset execution — every `search_pipeline` call
pays actor spawn + per-actor index open again, a fixed cost that dwarfs
scoring for small batches.

This is the one place the Dataset API genuinely can't express the
semantics (state that must outlive a pipeline execution), so the pool is
plain Ray actors: `size` replicated `_SearcherHost`s, each holding a full
IndexSearcher (num_shards=1 topology — actor-local doc freqs ARE global,
and each query's rows come back ranked from one actor, so there is no
df job and no reduce exchange).  `search_batch` round-robins the query
list across the pool and concatenates the per-actor Arrow tables.

Results are f32/rank-identical to ``search_pipeline(..., num_shards=1)``
(asserted in tests/test_round3_fixes.py::test_searcher_pool_parity).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..utils import remote_args


class _SearcherHost:
    """One pool replica: its searcher (full index, or one shard of
    segment ords) opened once in __init__."""

    def __init__(self, index_dir: str, use_wand: bool,
                 segment_ords: Optional[List[int]] = None):
        from .searcher import IndexSearcher

        self.searcher = IndexSearcher(index_dir, segment_ords)
        self.use_wand = use_wand
        self.chunks_served = 0

    def served(self) -> int:
        """Chunks handled so far (replica-utilization introspection)."""
        return self.chunks_served

    def ready(self) -> bool:
        # touch the global view so fids/bases concat happens at warm-up,
        # not inside the first timed query
        self.searcher._global_view()
        return True

    def doc_freqs(self, terms: List[str]):
        """Shard-local doc freqs (the sharded pool sums them globally)."""
        return self.searcher.doc_freqs(terms)

    def _get_parser(self, analyzer: str = None):
        from .queryparser import QueryParser

        parser = getattr(self, "_parser", None)
        if parser is None:
            parser = self._parser = QueryParser(
                analyzer or self.searcher.manifest.analyzer)
        return parser

    def parsed_stat_terms(self, chunk: List[Tuple[int, str, int]],
                          analyzer: str = None):
        """Shard-local doc freqs for every effective term the parsed
        queries need (fuzzy/regex expanded against THIS shard's vocab);
        the pool sums the per-shard maps into exact global stats."""
        from .query import collect_stat_terms

        parser = self._get_parser(analyzer)
        terms: set = set()
        for _, qtext, _ in chunk:
            q = parser.parse(str(qtext))
            for r in self.searcher.readers:
                terms |= collect_stat_terms(q, r)
        return {t: self.searcher.doc_freq(t) for t in terms}

    def search_parsed_chunk(self, chunk: List[Tuple[int, str, int]],
                            analyzer: str = None,
                            doc_freqs=None,
                            with_rank: bool = True) -> pa.Table:
        """Raw query STRINGS through the full QueryParser grammar
        (bool trees, phrases, fuzzy/regex automata, ranges, boosts).
        ``doc_freqs``: global stats map for sharded evaluation."""
        self.chunks_served += 1
        parser = self._get_parser(analyzer)
        df_of = (None if doc_freqs is None
                 else (lambda t: doc_freqs.get(t, 0)))
        out = {"query_id": [], "rank": [], "score": [], "segment_ord": [],
               "doc_id": []}
        for qid, qtext, k in chunk:
            hits = self.searcher.search_query(parser.parse(str(qtext)),
                                              int(k), doc_freq_of=df_of)
            for rank, (s, seg, doc) in enumerate(hits):
                out["query_id"].append(int(qid))
                out["rank"].append(rank)
                out["score"].append(np.float32(s))
                out["segment_ord"].append(seg)
                out["doc_id"].append(doc)
        cols = {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int32()),
            "score": pa.array(out["score"], type=pa.float32()),
            "segment_ord": pa.array(out["segment_ord"], type=pa.int32()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
        if not with_rank:
            cols.pop("rank")
        return pa.table(cols)

    def search_chunk(self, chunk: List[Tuple[int, List[str], str, int]],
                     doc_freqs=None, with_rank: bool = True) -> pa.Table:
        self.chunks_served += 1
        out = {"query_id": [], "rank": [], "score": [], "segment_ord": [],
               "doc_id": []}
        for qid, terms, mode, k in chunk:
            if str(mode) == "phrase":
                from .query import PhraseQuery

                df_of = (None if doc_freqs is None
                         else (lambda t: doc_freqs.get(t, 0)))
                hits = self.searcher.search_query(
                    PhraseQuery(list(terms)), int(k), doc_freq_of=df_of)
            else:
                hits = self.searcher.search(
                    list(terms), str(mode), int(k), doc_freqs=doc_freqs,
                    use_wand=self.use_wand)
            for rank, (s, seg, doc) in enumerate(hits):
                out["query_id"].append(int(qid))
                out["rank"].append(rank)
                out["score"].append(np.float32(s))
                out["segment_ord"].append(seg)
                out["doc_id"].append(doc)
        cols = {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int32()),
            "score": pa.array(out["score"], type=pa.float32()),
            "segment_ord": pa.array(out["segment_ord"], type=pa.int32()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
        if not with_rank:
            cols.pop("rank")
        return pa.table(cols)


def _merge_topk_table(tbl: pa.Table, queries) -> pa.Table:
    """Vectorized merge_fruits over the concatenated shard partials
    (``queries`` rows may be term 4-tuples or parsed 3-tuples — only
    the leading query_id and trailing k are read):
    ONE np.lexsort by (query_id asc, score desc, segment asc, doc asc)
    — the collector tie rule of searcher.merge_topk
    (reference src/collector/mod.rs:167-180) — then a run-length rank
    and per-query k truncation.  No per-hit Python; a 10^5-query batch
    merges in milliseconds on the driver."""
    qid = tbl.column("query_id").to_numpy().astype(np.int64, copy=False)
    score = tbl.column("score").to_numpy()  # f32 — negation is exact
    seg = tbl.column("segment_ord").to_numpy()
    doc = tbl.column("doc_id").to_numpy()
    order = np.lexsort((doc, seg, -score, qid))
    sq, ss, sg, sd = qid[order], score[order], seg[order], doc[order]
    n = len(sq)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = sq[1:] != sq[:-1]
    run_id = np.cumsum(change) - 1
    rank = np.arange(n, dtype=np.int64) - np.flatnonzero(change)[run_id]
    ks = sorted((int(q[0]), int(q[-1])) for q in queries)
    k_qids = np.array([q for q, _ in ks], dtype=np.int64)
    k_vals = np.array([k for _, k in ks], dtype=np.int64)
    keep = rank < k_vals[np.searchsorted(k_qids, sq)]
    return pa.table({
        "query_id": pa.array(sq[keep], type=pa.int64()),
        "rank": pa.array(rank[keep].astype(np.int32), type=pa.int32()),
        "score": pa.array(ss[keep], type=pa.float32()),
        "segment_ord": pa.array(sg[keep].astype(np.int32),
                                type=pa.int32()),
        "doc_id": pa.array(sd[keep].astype(np.int64), type=pa.int64()),
    })


def _empty_result(with_rank: bool = True) -> pa.Table:
    cols = {
        "query_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int32()),
        "score": pa.array([], type=pa.float32()),
        "segment_ord": pa.array([], type=pa.int32()),
        "doc_id": pa.array([], type=pa.int64()),
    }
    if not with_rank:
        cols.pop("rank")
    return pa.table(cols)


class SearcherPool:
    """Create once, query many times; ``close()`` (or GC) frees actors.

    ``num_shards=1`` (default): ``size`` replicas each hold the FULL
    index; batches split across replicas (throughput parallelism).
    ``num_shards>1``: the segments are partitioned into shards, one
    actor per shard (times ``size`` replicas per shard) — the serving
    shape for an index larger than one node's memory.  A batch then
    runs two rounds: shard-local doc freqs are summed into exact global
    stats, every shard scores every query with those stats, and the
    driver merges per-query top-k with the collector tie rule — the
    persistent-actor analog of ``search_pipeline``'s scatter-gather,
    f32/rank-identical to it (tests/test_round3_fixes.py)."""

    def __init__(self, index_dir: str, size: int = 4,
                 use_wand: bool = False, num_cpus: float = 1.0,
                 num_shards: int = 1):
        import ray

        from ..index.manifest import load_manifest

        self._config = (index_dir, size, use_wand, num_cpus, num_shards)
        host = ray.remote(_SearcherHost).options(
            num_cpus=num_cpus, **remote_args())
        self.num_shards = max(1, num_shards)
        if self.num_shards == 1:
            self.shards: List[Optional[List[int]]] = [None]
            self.actors = [host.remote(index_dir, use_wand)
                           for _ in range(size)]
            self._shard_of = [0] * size
        else:
            manifest = load_manifest(index_dir)
            ords = [s["segment_ord"] for s in manifest.segments]
            shards = [ords[i::self.num_shards]
                      for i in range(self.num_shards)]
            self.shards = [s for s in shards if s]
            self.num_shards = len(self.shards)
            replicas = max(1, size // self.num_shards)
            self.actors = []
            self._shard_of = []
            for si, shard in enumerate(self.shards):
                for _ in range(replicas):
                    self.actors.append(
                        host.remote(index_dir, use_wand, shard))
                    self._shard_of.append(si)
        self.size = len(self.actors)

    def warm(self) -> None:
        """Block until every replica has opened its index."""
        import ray

        ray.get([a.ready.remote() for a in self.actors])

    def _shard_groups(self) -> List[List]:
        """Actors grouped by shard index: groups[si] = that shard's
        replicas (every shard has the same replica count by
        construction)."""
        groups: List[List] = [[] for _ in range(self.num_shards)]
        for a, si in zip(self.actors, self._shard_of):
            groups[si].append(a)
        return groups

    def _one_actor_per_shard(self) -> List:
        """One replica per shard, ROTATING across calls so repeated
        small batches spread over all replicas instead of pinning the
        first one (ADVICE r3: extra replicas were spawned but idle)."""
        self._rr = getattr(self, "_rr", -1) + 1
        return [g[self._rr % len(g)] for g in self._shard_groups()]

    def search_batch(
        self, queries: Sequence[Tuple[int, Sequence[str], str, int]],
        chunks_per_actor: int = 1,
    ) -> pa.Table:
        """(query_id, terms, mode, k) batch → ranked Arrow table,
        identical to ``search_pipeline`` at the same num_shards."""
        import ray

        queries = list(queries)
        if self.num_shards > 1:
            return self._search_batch_sharded(queries)
        n_chunks = max(1, self.size * chunks_per_actor)
        chunks = [queries[i::n_chunks] for i in range(n_chunks)]
        refs = [
            self.actors[i % self.size].search_chunk.remote(c)
            for i, c in enumerate(chunks) if c
        ]
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return _empty_result()
        return pa.concat_tables(tables).sort_by(
            [("query_id", "ascending"), ("rank", "ascending")])

    def search_parsed_batch(
        self, queries: Sequence[Tuple[int, str, int]],
        chunks_per_actor: int = 1,
    ) -> pa.Table:
        """(query_id, query_string, k) batch through the full parser
        grammar — the warm-pool analog of ``parsed_search_pipeline``.

        Sharded mode runs the same two rounds as term batches, with the
        stats round parsing each query and expanding fuzzy/regex against
        each shard's own vocabulary (collect_stat_terms): the union of
        per-shard expansions equals the full-vocab expansion and summed
        dfs are exact, so results are f32/rank-identical to a full-index
        replica."""
        import ray

        queries = list(queries)
        if self.num_shards > 1:
            return self._search_parsed_batch_sharded(queries)
        n_chunks = max(1, self.size * chunks_per_actor)
        chunks = [queries[i::n_chunks] for i in range(n_chunks)]
        refs = [
            self.actors[i % self.size].search_parsed_chunk.remote(c)
            for i, c in enumerate(chunks) if c
        ]
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return _empty_result()
        return pa.concat_tables(tables).sort_by(
            [("query_id", "ascending"), ("rank", "ascending")])

    def _search_parsed_batch_sharded(self, queries) -> pa.Table:
        import ray

        # round 1: every shard parses + expands against its own vocab and
        # reports local dfs; summed -> exact global stats (not cached:
        # fuzzy/regex expansions are query-dependent)
        partials = ray.get([a.parsed_stat_terms.remote(queries)
                            for a in self._one_actor_per_shard()])
        dfs: dict = {}
        for p in partials:
            for t, df in p.items():
                dfs[t] = dfs.get(t, 0) + df
        # round 2: chunk the batch across each shard's replicas
        refs = []
        for group in self._shard_groups():
            r = len(group)
            for j, actor in enumerate(group):
                chunk = queries[j::r]
                if chunk:
                    refs.append(actor.search_parsed_chunk.remote(
                        chunk, None, dfs, False))
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return _empty_result()
        return _merge_topk_table(pa.concat_tables(tables), queries)

    def _search_batch_sharded(self, queries) -> pa.Table:
        import ray

        terms = sorted({t for _, ts, _, _ in queries for t in ts})
        # round 1: global stats = Σ shard-local doc freqs — cached across
        # batches (a snapshot pool serves ONE commit; reload() clears)
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        missing = [t for t in terms if t not in cache]
        if missing:
            partials = ray.get([a.doc_freqs.remote(missing)
                                for a in self._one_actor_per_shard()])
            for t in missing:
                cache[t] = sum(p.get(t, 0) for p in partials)
        dfs = {t: cache[t] for t in terms}
        # round 2: every SHARD scores every query with the global stats,
        # but the query batch is chunked across that shard's replicas so
        # all size actors work (each query still reaches exactly one
        # replica of each shard)
        refs = []
        for group in self._shard_groups():
            r = len(group)
            for j, actor in enumerate(group):
                chunk = queries[j::r]
                if chunk:
                    refs.append(actor.search_chunk.remote(chunk, dfs,
                                                          False))
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return _empty_result()
        return _merge_topk_table(pa.concat_tables(tables), queries)

    def reload(self) -> None:
        """Swap every replica to a fresh point-in-time snapshot of the
        CURRENT commit (the reference's IndexReader reload: a new
        searcher generation is warmed, then the old one is dropped —
        queries in flight on old actors finish against the old
        snapshot; new batches see the new commit)."""
        old = self.actors
        fresh = SearcherPool(self._config[0], size=self._config[1],
                             use_wand=self._config[2],
                             num_cpus=self._config[3],
                             num_shards=self._config[4])
        fresh.warm()
        self.actors = fresh.actors
        self._shard_of = fresh._shard_of
        self.shards = fresh.shards
        self.num_shards = fresh.num_shards
        self.size = fresh.size
        self._df_cache = {}  # new commit → new global stats
        fresh.actors = []  # ownership moved; don't let GC kill them
        import ray

        for a in old:
            ray.kill(a, no_restart=True)

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
