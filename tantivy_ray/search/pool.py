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
    """One pool replica: full-index searcher opened once in __init__."""

    def __init__(self, index_dir: str, use_wand: bool):
        from .searcher import IndexSearcher

        self.searcher = IndexSearcher(index_dir)
        self.use_wand = use_wand

    def ready(self) -> bool:
        # touch the global view so fids/bases concat happens at warm-up,
        # not inside the first timed query
        self.searcher._global_view()
        return True

    def search_chunk(self, chunk: List[Tuple[int, List[str], str, int]]
                     ) -> pa.Table:
        out = {"query_id": [], "rank": [], "score": [], "segment_ord": [],
               "doc_id": []}
        for qid, terms, mode, k in chunk:
            if str(mode) == "phrase":
                from .query import PhraseQuery

                hits = self.searcher.search_query(
                    PhraseQuery(list(terms)), int(k))
            else:
                hits = self.searcher.search(
                    list(terms), str(mode), int(k), use_wand=self.use_wand)
            for rank, (s, seg, doc) in enumerate(hits):
                out["query_id"].append(int(qid))
                out["rank"].append(rank)
                out["score"].append(np.float32(s))
                out["segment_ord"].append(seg)
                out["doc_id"].append(doc)
        return pa.table({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int32()),
            "score": pa.array(out["score"], type=pa.float32()),
            "segment_ord": pa.array(out["segment_ord"], type=pa.int32()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        })


class SearcherPool:
    """Create once, query many times; ``close()`` (or GC) frees actors."""

    def __init__(self, index_dir: str, size: int = 4,
                 use_wand: bool = False, num_cpus: float = 1.0):
        import ray

        host = ray.remote(_SearcherHost).options(
            num_cpus=num_cpus, runtime_env=remote_args()["runtime_env"])
        self.actors = [host.remote(index_dir, use_wand) for _ in range(size)]
        self.size = size

    def warm(self) -> None:
        """Block until every replica has opened its index."""
        import ray

        ray.get([a.ready.remote() for a in self.actors])

    def search_batch(
        self, queries: Sequence[Tuple[int, Sequence[str], str, int]],
        chunks_per_actor: int = 1,
    ) -> pa.Table:
        """(query_id, terms, mode, k) batch → ranked Arrow table,
        identical to ``search_pipeline(..., num_shards=1)``."""
        import ray

        n_chunks = max(1, self.size * chunks_per_actor)
        chunks = [list(queries)[i::n_chunks] for i in range(n_chunks)]
        refs = [
            self.actors[i % self.size].search_chunk.remote(c)
            for i, c in enumerate(chunks) if c
        ]
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int32()),
                "score": pa.array([], type=pa.float32()),
                "segment_ord": pa.array([], type=pa.int32()),
                "doc_id": pa.array([], type=pa.int64()),
            })
        pdf = pa.concat_tables(tables).to_pandas()
        pdf = pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
