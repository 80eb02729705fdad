"""JSON dynamic fields + snippets (reference examples/json_field.rs,
index_with_json.rs, snippet.rs): flatten a JSON column to path=value
terms; generate highlighted fragments for hits."""

import tempfile

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.pipelines.json_fields import flatten_json
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.snippet import SnippetGenerator


def main():
    # JSON → "attributes.path=value" terms, indexed with whitespace
    docs = ['{"severity": "INFO", "code": 3}',
            '{"severity": "ERROR", "code": 7}']
    terms = [" ".join(flatten_json("attributes", j)) for j in docs]
    print("flattened:", terms[0])
    index_dir = tempfile.mkdtemp(prefix="tvr_json_")
    table = pa.table({"url": ["l1", "l2"], "text": terms})
    meta = build_segment_from_table(table, 0, index_dir,
                                    analyzer="whitespace")
    write_manifest(index_dir, IndexManifest(segments=[meta],
                                            analyzer="whitespace"))
    s = IndexSearcher(index_dir)
    hits = s.search(["attributes.severity=error"], "or", 10)
    assert len(hits) == 1
    print("json term query →", len(hits), "hit")

    # snippets over plain text
    body = ("rust is a multi paradigm computer programming language "
            "focused on performance and safety")
    gen = SnippetGenerator.from_terms(["rust", "safety"], None,
                                      max_num_chars=50)
    snip = gen.snippet(body)
    print("snippet:", snip.to_html())
    assert "<b>" in snip.to_html()


if __name__ == "__main__":
    main()
