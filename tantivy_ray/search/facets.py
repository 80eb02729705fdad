"""Facet subtree collection (reference src/collector/facet_collector.rs:
183-425).

A facet is a hierarchical path ``/a/b/c``.  The reference's
FacetCollector takes a set of queried facet roots and counts, for every
matching document, the IMMEDIATE CHILD of each root on the document's
facet path (documents deeper in the subtree count toward their
ancestor child — /a/b/c increments child /a/b under root /a).

Two forms:
  * ``facet_child_counts(ds, path_col, roots)`` — Dataset form: one
    vectorized ``map_batches`` partial + a tiny groupby; the 100-TB
    path (facet paths are short strings; the shuffle carries only
    (root, child, count) partials).
  * ``collect_facets(searcher, query, paths_of_doc, roots)`` — the
    collector form over query results (per-segment doc ids → facet
    paths → child counts), mirroring the reference API.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence

import pyarrow as pa

from ..utils import remote_args


def _norm_root(root: str) -> str:
    root = root.rstrip("/")
    return root  # "" = the facet root "/"


def child_of(path: str, root: str) -> str | None:
    """The immediate child of ``root`` on ``path``, or None if ``path``
    is not strictly inside the root's subtree."""
    root = _norm_root(root)
    if not path.startswith(root + "/"):
        return None
    rest = path[len(root) + 1:]
    if not rest:
        return None
    seg = rest.split("/", 1)[0]
    return f"{root}/{seg}"


def facet_child_counts(ds, path_col: str, roots: Sequence[str],
                       min_count: int = 1) -> pa.Table:
    """→ (root, child, doc_count) for every immediate child of every
    root, sorted (root, child).  One map_batches partial per batch, then
    a small groupby — facet paths never leave the workers."""
    roots = list(roots)

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native: starts_with + slice + split per root; only the
        # UNIQUE children (bounded by facet fanout, not rows) touch Python
        import pyarrow.compute as pc

        col = batch.column(path_col)
        rows_root, rows_child, rows_n = [], [], []
        for root in roots:
            pre = _norm_root(root) + "/"
            mask = pc.fill_null(pc.starts_with(col, pre), False)
            inside = pc.filter(col, mask)
            if len(inside) == 0:
                continue
            rest = pc.utf8_slice_codeunits(inside, len(pre))
            seg = pc.list_element(
                pc.split_pattern(rest, "/", max_splits=1), 0)
            seg = pc.filter(seg, pc.not_equal(seg, ""))
            if len(seg) == 0:
                continue
            vc = pc.value_counts(seg)
            vals = vc.field("values").to_pylist()
            rows_root.extend([pre] * len(vals))
            rows_child.extend(pre + v for v in vals)
            rows_n.extend(vc.field("counts").to_pylist())
        return pa.table({
            "root": pa.array(rows_root, type=pa.string()),
            "child": pa.array(rows_child, type=pa.string()),
            "n": pa.array(rows_n, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow", **remote_args())
           .groupby(["root", "child"])
           .aggregate(Sum("n", alias_name="doc_count")))
    pdf = agg.to_pandas()
    pdf["doc_count"] = pdf["doc_count"].astype("int64")
    pdf = pdf[pdf["doc_count"] >= min_count]
    pdf = pdf.sort_values(["root", "child"]).reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def collect_facets(searcher, query, facet_paths_of: Dict[int, List[List[str]]],
                   roots: Sequence[str]) -> Dict[str, Dict[str, int]]:
    """Collector form: evaluate ``query`` on every segment of
    ``searcher``, look up each matching doc's facet paths and count
    immediate children per root (reference FacetCollector::harvest).

    facet_paths_of: {segment_ord: list-per-doc of facet path lists} —
    the facet fast field (a doc may carry several facets)."""
    from .query import QueryEvaluator

    out: Dict[str, Counter] = {_norm_root(r) + "/": Counter()
                               for r in roots}
    for reader in searcher.readers:
        ev = QueryEvaluator(reader, searcher.total_num_docs,
                            searcher.average_fieldnorm)
        docs, _ = ev.evaluate(query)
        paths_per_doc = facet_paths_of[reader.segment_ord]
        for d in docs:
            for p in paths_per_doc[int(d)]:
                for root in roots:
                    c = child_of(p, root)
                    if c is not None:
                        out[_norm_root(root) + "/"][c] += 1
    return {r: dict(c) for r, c in out.items()}
