"""Basic search (reference examples/basic_search.rs): build an index
from documents, parse a query string, collect top-k with BM25."""

import tempfile

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher

DOCS = [
    ("The Old Man and the Sea",
     "He was an old man who fished alone in a skiff in the Gulf Stream"),
    ("Of Mice and Men",
     "A few miles south of Soledad, the Salinas River drops in close"),
    ("Frankenstein",
     "You will rejoice to hear that no disaster has accompanied the "
     "commencement of an enterprise"),
]


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_basic_")
    table = pa.table({
        "url": [t for t, _ in DOCS],
        "text": [f"{t} {b}" for t, b in DOCS],
    })
    meta = build_segment_from_table(table, 0, index_dir)
    write_manifest(index_dir, IndexManifest(segments=[meta]))

    searcher = IndexSearcher(index_dir)
    hits = searcher.parse_and_search("sea AND old", k=10)
    keys = searcher.resolve_doc_keys([(s, d) for _, s, d in hits],
                                     id_col="url")
    for (score, _, _), key in zip(hits, keys):
        print(f"{score:.4f}  {key}")
    assert keys and keys[0] == "The Old Man and the Sea"


if __name__ == "__main__":
    main()
