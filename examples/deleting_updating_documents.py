"""Deletes + updates (reference examples/deleting_updating_documents.rs):
delete-by-term tombstones applied at commit; an update is delete + add."""

import tempfile

from tantivy_ray.search import IndexReader, ReloadPolicy
from tantivy_ray.sources.writer import IndexWriter


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_del_")
    w = IndexWriter(index_dir, docs_per_segment=10)
    w.add_document({"url": "doc1", "text": "old version of one"})
    w.add_document({"url": "doc2", "text": "another document two"})
    w.commit()

    reader = IndexReader(index_dir,
                         reload_policy=ReloadPolicy.MANUAL)
    assert reader.searcher().total_num_docs == 2

    # update doc1 = delete its term + add the new version
    w.delete_by_term("old")
    stamp = w.add_document({"url": "doc1", "text": "new version of one"})
    w.commit()
    print("committed opstamp:", w.committed_opstamp, "==", stamp)

    reader.reload()
    s = reader.searcher()
    hits_old = s.search(["old"], "or", 10)
    hits_new = s.search(["new"], "or", 10)
    print("docs matching 'old':", len(hits_old), "| 'new':", len(hits_new))
    assert len(hits_old) == 0 and len(hits_new) == 1

    # delete by QUERY (reference IndexWriter::delete_query,
    # index_writer.rs:698): any Query the searcher can evaluate
    from tantivy_ray.search.query import BooleanQuery, TermQuery

    w.delete_by_query(BooleanQuery(must=[TermQuery("another"),
                                         TermQuery("two")]))
    w.commit()
    reader.reload()
    s = reader.searcher()
    assert len(s.search(["two"], "or", 10)) == 0
    print("after delete_by_query('another AND two'):",
          len(s.search(["document"], "or", 10)), "docs left")


if __name__ == "__main__":
    main()
