"""Faceted search (reference examples/faceted_search.rs and
faceted_search_with_tweaked_score.rs): hierarchical facet counts under
queried roots, and facet-driven score tweaking via BoostQuery."""

import tempfile

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.facets import child_of, collect_facets
from tantivy_ray.search.query import (AllQuery, BooleanQuery, BoostQuery,
                                      TermQuery)

BOOKS = [
    ("dune", "/category/fiction/scifi"),
    ("neuromancer", "/category/fiction/scifi"),
    ("emma", "/category/fiction/classic"),
    ("cosmos", "/category/science/astronomy"),
]


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_facet_")
    table = pa.table({
        "url": [t for t, _ in BOOKS],
        "text": [t for t, _ in BOOKS],
    })
    meta = build_segment_from_table(table, 0, index_dir)
    write_manifest(index_dir, IndexManifest(segments=[meta]))
    s = IndexSearcher(index_dir)

    facet_paths = {0: [[p] for _, p in BOOKS]}
    counts = collect_facets(s, AllQuery(), facet_paths,
                            roots=["/category", "/category/fiction"])
    print(counts)
    assert counts["/category/"]["/category/fiction"] == 3
    assert counts["/category/fiction/"]["/category/fiction/scifi"] == 2

    # tweaked score: boost scifi titles in an OR query
    q = BooleanQuery(should=[
        TermQuery("dune"), TermQuery("emma"),
        BoostQuery(TermQuery("neuromancer"), boost=3.0),
    ])
    hits = s.search_query(q, 3)
    top_key = s.resolve_doc_keys([(hits[0][1], hits[0][2])], "url")[0]
    print("top after boost:", top_key)
    assert top_key == "neuromancer"
    assert child_of("/category/fiction/scifi", "/category") == \
        "/category/fiction"


if __name__ == "__main__":
    main()
