"""Typed term fields (reference examples/date_time_field.rs,
integer_range_search.rs, ip_field.rs): order-preserving encodings make
range queries plain sorted-dict scans."""

import tempfile
from datetime import datetime, timezone

import pyarrow as pa

from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.numeric import encode_datetime_s, encode_i64, encode_ip
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import NumericRangeQuery, count_query

ROWS = [
    (2, datetime(2022, 1, 1, tzinfo=timezone.utc), "10.0.0.1"),
    (7, datetime(2022, 6, 1, tzinfo=timezone.utc), "10.0.0.9"),
    (13, datetime(2023, 1, 1, tzinfo=timezone.utc), "192.168.1.1"),
]


def main():
    index_dir = tempfile.mkdtemp(prefix="tvr_typed_")
    table = pa.table({
        "url": [f"d{i}" for i in range(len(ROWS))],
        "text": [" ".join([encode_i64(n), encode_datetime_s(ts),
                           encode_ip(ip)])
                 for n, ts, ip in ROWS],
    })
    meta = build_segment_from_table(table, 0, index_dir,
                                    analyzer="whitespace")
    write_manifest(index_dir, IndexManifest(segments=[meta],
                                            analyzer="whitespace"))
    s = IndexSearcher(index_dir)

    def count(q):
        return count_query(s.readers, q, s.total_num_docs,
                           s.average_fieldnorm, s.doc_freq)

    n = count(NumericRangeQuery(None, lower=5, upper=20, kind="i64"))
    print("ints in [5, 20):", n)
    assert n == 2
    n = count(NumericRangeQuery(
        None, lower=datetime(2022, 3, 1, tzinfo=timezone.utc),
        upper=datetime(2024, 1, 1, tzinfo=timezone.utc), kind="date"))
    print("dates in [2022-03, 2024-01):", n)
    assert n == 2
    n = count(NumericRangeQuery(None, lower="10.0.0.0",
                                upper="10.0.0.255", kind="ip",
                                include_upper=True))
    print("ips in 10.0.0.0/24:", n)
    assert n == 2


if __name__ == "__main__":
    main()
