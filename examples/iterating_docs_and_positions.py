"""Posting/position iteration (reference
examples/iterating_docs_and_positions.rs): walk a term's posting list
(doc ids, term frequencies) and per-doc token positions."""

import tempfile

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import SegmentReader, build_segment_from_table


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_iter_")
    table = pa.table({
        "url": ["a", "b", "c"],
        "text": ["the horse and the cart",
                 "red horse white horse",
                 "no animals here"],
    })
    meta = build_segment_from_table(table, 0, index_dir,
                                    record_positions=True)
    write_manifest(index_dir, IndexManifest(segments=[meta],
                                            record_positions=True))
    r = SegmentReader(f"{index_dir}/seg-00000")

    docs, tfs = r.postings("horse")
    positions = r.positions("horse")
    for d, tf, pos in zip(docs, tfs, positions):
        print(f"doc {d}: tf={tf} positions={pos.tolist()}")
    assert docs.tolist() == [0, 1]
    assert tfs.tolist() == [1, 2]
    assert positions[1].tolist() == [1, 3]
    print("doc_freq:", r.doc_freq("horse"), "| vocab:", r.num_terms())


if __name__ == "__main__":
    main()
