"""Distributed build + warm searcher pool (reference
examples/index_from_multiple_threads.rs and warmer.rs, Ray-Data-first):
one map_batches task per partition descriptor builds segments in
parallel; a searcher actor pool loads the index once per actor and
serves a query batch."""

import tempfile

import ray

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")

import pyarrow as pa
import pyarrow.parquet as pq

from tantivy_ray.index.build import build_index
from tantivy_ray.pipelines.search_pipeline import search_pipeline


def main():
    tmp = tempfile.mkdtemp(prefix="tvr_dist_")
    src = f"{tmp}/docs.parquet"
    pq.write_table(pa.table({
        "url": [f"u{i}" for i in range(2000)],
        "text": [f"alpha beta doc{i % 50} gamma" for i in range(2000)],
    }), src, row_group_size=250)

    # 8 partitions → 8 parallel build tasks (deterministic doc ids,
    # resumable: rerunning skips sealed segments)
    manifest = build_index(src, f"{tmp}/ix", docs_per_segment=250)
    print("segments:", len(manifest.segments),
          "docs:", manifest.total_num_docs)

    tbl = search_pipeline(
        f"{tmp}/ix",
        [(i, ["alpha", f"doc{i}"], "and", 5) for i in range(10)],
        num_shards=1, concurrency=2,
    )
    print("result rows:", tbl.num_rows)
    assert tbl.num_rows > 0


if __name__ == "__main__":
    main()
    ray.shutdown()
