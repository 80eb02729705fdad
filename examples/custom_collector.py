"""Custom collectors (reference examples/custom_collector.rs): the
extension surface — collect every matching DocAddress (DocSetCollector),
top-k by a fast field, and a hand-rolled stats collector over the
matching docs' fast-field values."""

import tempfile

import numpy as np
import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import (QueryEvaluator, TermQuery,
                                      collect_docset, topk_by_fast_field)


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_coll_")
    table = pa.table({
        "url": [f"p{i}" for i in range(6)],
        "text": ["white horse", "black horse", "white cat",
                 "white horse rider", "brown dog", "white pony"],
        "price": pa.array([12, 7, 5, 40, 3, 9], type=pa.int64()),
    })
    meta = build_segment_from_table(table, 0, index_dir,
                                    fast_fields=["price"])
    write_manifest(index_dir, IndexManifest(segments=[meta]))
    s = IndexSearcher(index_dir)

    q = TermQuery("white")
    # 1. DocSetCollector: all matching addresses
    docset = collect_docset(s.readers, q, s.total_num_docs,
                            s.average_fieldnorm, s.doc_freq)
    print("matches:", docset)
    assert len(docset) == 4

    # 2. top-k by fast field
    hits = topk_by_fast_field(s.readers, q, "price", 2, True,
                              s.total_num_docs, s.average_fieldnorm,
                              s.doc_freq)
    print("top price:", hits)
    assert hits[0][0] == 40

    # 3. custom stats collector: mean price of matching docs — the
    #    per-segment collect / merge shape of the reference example
    total, count = 0.0, 0
    for r in s.readers:
        ev = QueryEvaluator(r, s.total_num_docs, s.average_fieldnorm,
                            s.doc_freq)
        docs, _ = ev.evaluate(q)
        vals = r.fast_field("price")[docs]
        total += float(np.sum(vals))
        count += len(vals)
    print("mean price of 'white' docs:", total / count)
    assert count == 4


if __name__ == "__main__":
    main()
