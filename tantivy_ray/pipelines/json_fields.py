"""JSON dynamic fields — path-flattened terms (the reference's JsonObject
escape hatch: terms embed the json path,
/root/reference/src/indexer/segment_writer.rs:381-400,
src/indexer/path_to_unordered_id.rs; ``expand_dots`` flattening).

A JSON column is flattened into `col.path.to.key=value` term strings;
indexing them with the ``whitespace`` analyzer (terms contain '.'/'='
which the default analyzer would split) makes every json path+value pair
an exact-match term — TermQuery("props.k=69"), RangeQuery over
"props.k=" prefixes, facet-style doc_freq counts, etc.
"""

from __future__ import annotations

import json
from typing import Iterable, List

import pyarrow as pa


def flatten_json(col: str, raw: str) -> List[str]:
    """One JSON document → sorted flattened terms.

    Scalars become `col.path=value` (strings lowercased, numbers via
    repr-normalization: ints stay ints, floats minimal repr); lists index
    into the path like expand_dots; null/objects recurse."""
    if not raw:
        return []
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return []
    out: List[str] = []

    def norm(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        if isinstance(v, str):
            return v.lower().replace(" ", "_")
        return str(v)

    def walk(path: str, v) -> None:
        if isinstance(v, dict):
            for k2, v2 in v.items():
                walk(f"{path}.{k2}", v2)
        elif isinstance(v, list):
            for i, v2 in enumerate(v):
                walk(f"{path}.{i}", v2)
        elif v is None:
            out.append(f"{path}=null")
        else:
            out.append(f"{path}={norm(v)}")

    walk(col, obj)
    return sorted(out)


class FlattenJsonStage:
    """map_batches stage: json string column → space-joined flattened
    terms in ``out_col`` (index with analyzer='whitespace')."""

    def __init__(self, json_col: str = "props", out_col: str = "json_terms"):
        self.json_col = json_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [
            " ".join(flatten_json(self.json_col, r))
            for r in batch.column(self.json_col).to_pylist()
        ]
        arr = pa.array(vals, type=pa.string())
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)


def build_json_index(sf_dir: str, out_dir: str, table: str = "events",
                     json_col: str = "props", id_col: str = "event_id",
                     docs_per_segment: int = 50_000):
    """events.props → flattened-term index (whitespace analyzer).

    Fully distributed: the flatten runs as the build task's per-partition
    ``transform`` — only the two source columns leave the parquet and no
    whole-dataset materialization happens on the driver."""
    import os

    from ..index.build import build_index

    build_index(
        os.path.join(sf_dir, f"{table}.parquet"), out_dir,
        text_col="json_terms", id_col=id_col, analyzer="whitespace",
        docs_per_segment=docs_per_segment,
        transform=FlattenJsonStage(json_col),
        source_columns=[id_col, json_col],
    )
    return out_dir
