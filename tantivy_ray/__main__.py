"""Command-line entry points: build / search / merge / compact.

    python -m tantivy_ray build  --input pages.parquet --index ./ix \
        --text-col text --id-col url [--analyzer default] [--positions]
    python -m tantivy_ray search --index ./ix --query "alpha AND beta" \
        [-k 10]
    python -m tantivy_ray merge   --index ./ix --out ./merged
    python -m tantivy_ray compact --index ./ix

Owns its Ray session (guarded init + shutdown) per the repo rule that
only CLIs, bench.py and the test fixture initialize Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    return ray


def cmd_build(args) -> int:
    _ray_init()
    from .index.build import build_index

    manifest = build_index(
        args.input, args.index,
        text_col=args.text_col, id_col=args.id_col,
        analyzer=args.analyzer,
        record_positions=args.positions,
        docs_per_segment=args.docs_per_segment,
        sort_by=((args.sort_by, args.sort_order)
                 if args.sort_by else None),
        fast_fields=([args.text_col] if args.store_text else None),
    )
    print(json.dumps({
        "segments": len(manifest.segments),
        "total_num_docs": manifest.total_num_docs,
        "total_num_tokens": manifest.total_num_tokens,
    }))
    return 0


def cmd_search(args) -> int:
    from .search import IndexSearcher

    s = IndexSearcher(args.index)
    hits = s.parse_and_search(args.query, args.k)
    keys = s.resolve_doc_keys([(seg, doc) for _, seg, doc in hits],
                              id_col=args.id_col)
    for rank, ((score, seg, doc), key) in enumerate(zip(hits, keys)):
        print(json.dumps({"rank": rank, "score": round(float(score), 6),
                          "doc": str(key), "segment": int(seg),
                          "doc_id": int(doc)}))
    return 0


def cmd_merge(args) -> int:
    _ray_init()
    from .index.merge import merge_segments

    meta = merge_segments(args.index, args.out)
    print(json.dumps(meta))
    return 0


def cmd_compact(args) -> int:
    _ray_init()
    from .index.compaction import LogMergePolicy, compact

    res = compact(args.index, LogMergePolicy(
        min_num_segments=args.min_segments))
    print(json.dumps({"merged_groups": len(res["merged_groups"])}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tantivy_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from parquet")
    b.add_argument("--input", required=True, nargs="+")
    b.add_argument("--index", required=True)
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="url")
    b.add_argument("--analyzer", default="default")
    b.add_argument("--positions", action="store_true")
    b.add_argument("--docs-per-segment", type=int, default=100_000)
    b.add_argument("--sort-by", default=None)
    b.add_argument("--store-text", action="store_true",
                   help="store the text column in the doc store "
                        "(required for later compaction)")
    b.add_argument("--sort-order", default="asc", choices=["asc", "desc"])
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="parse and run a query string")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--id-col", default="url")
    s.set_defaults(fn=cmd_search)

    m = sub.add_parser("merge", help="groupby-term merge to super-segments")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser("compact", help="LogMergePolicy compaction")
    c.add_argument("--index", required=True)
    c.add_argument("--min-segments", type=int, default=8)
    c.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
