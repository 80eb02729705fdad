"""Fuzzy search + phrase-prefix (reference examples/fuzzy_search.rs and
phrase_prefix_search.rs): Levenshtein-automaton term expansion and
last-term-prefix phrase matching."""

import tempfile

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import FuzzyTermQuery, PhrasePrefixQuery


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_fuzzy_")
    table = pa.table({
        "url": ["a", "b", "c"],
        "text": ["the diary of muadib",
                 "the apple and the quince",
                 "a dairy cow in the garden"],
    })
    meta = build_segment_from_table(table, 0, index_dir,
                                    record_positions=True)
    write_manifest(index_dir, IndexManifest(segments=[meta],
                                            record_positions=True))
    s = IndexSearcher(index_dir)

    # "diary"~1 matches both diary and dairy (transposition)
    hits = s.search_query(FuzzyTermQuery("diary", 1, transposition=True), 10)
    assert len(hits) == 2
    print("fuzzy 'diary'~1 →", len(hits), "docs")

    # phrase prefix: "the di..." expands over the sorted dict
    hits = s.search_query(PhrasePrefixQuery(["the", "di"]), 10)
    assert len(hits) == 1
    print("phrase-prefix 'the di*' →", len(hits), "doc")


if __name__ == "__main__":
    main()
