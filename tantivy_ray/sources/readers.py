"""Input sources — Parquet is primary; JSON-lines / CSV for parity with the
reference's doc-ingestion surface (tantivy's benches parse JSON docs,
/root/reference/benches/index-bench.rs:20-24; TantivyDocument::parse_json).

Each returns a ``ray.data.Dataset`` with at least (id_col, text_col); extra
columns ride along as fast-field candidates."""

from __future__ import annotations

from typing import Optional, Sequence


def pages_from_parquet(paths, columns: Optional[Sequence[str]] = None):
    import ray.data as rd

    return rd.read_parquet(paths, columns=list(columns) if columns else None)


def pages_from_json(paths):
    """JSON-lines files → Dataset (ray.data.read_json)."""
    import ray.data as rd

    return rd.read_json(paths)


def pages_from_csv(paths):
    import ray.data as rd

    return rd.read_csv(paths)
