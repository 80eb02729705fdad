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
import math
from typing import Iterable, List, Optional

import pyarrow as pa

# separator between a json path and its TYPED value encoding (reference
# json_utils.rs:146-210 appends a type byte + order-preserving fast-value
# bytes after the path id; here the type is a 1-char code and the value
# the hex codecs of index/numeric.py, so lexicographic term order ==
# numeric order within one (path, type) prefix).  '\x01' never occurs in
# flattened text terms and the whitespace analyzer passes it through.
TYPED_SEP = "\x01"


def typed_json_terms(path: str, v) -> List[str]:
    """Typed term(s) for a numeric/bool JSON leaf (reference
    segment_writer.rs:381-400 via json_utils.rs index_json_value):
    integral numbers normalize to the i64 encoding — the reference
    coerces query and index side alike — non-integral finite floats to
    f64, bools to b0/b1.  Strings/null have no typed form here."""
    from ..index.numeric import encode_f64, encode_i64

    if isinstance(v, bool):
        return [f"{path}{TYPED_SEP}b" + ("1" if v else "0")]
    if isinstance(v, int):
        if -(1 << 63) <= v < (1 << 63):
            return [f"{path}{TYPED_SEP}i{encode_i64(v)}"]
        return [f"{path}{TYPED_SEP}f{encode_f64(float(v))}"]
    if isinstance(v, float):
        if not math.isfinite(v):
            return []  # reference drops non-finite (json_utils.rs:171)
        if v.is_integer() and abs(v) < float(1 << 63):
            return [f"{path}{TYPED_SEP}i{encode_i64(int(v))}"]
        return [f"{path}{TYPED_SEP}f{encode_f64(v)}"]
    return []


def flatten_json(col: str, raw: str) -> List[str]:
    """One JSON document → sorted flattened terms.

    Scalars become `col.path=value` (strings lowercased, numbers via
    repr-normalization: ints stay ints, floats minimal repr); lists index
    into the path like expand_dots; null/objects recurse.  Numeric and
    bool leaves ADDITIONALLY emit a typed term (``typed_json_terms``) so
    range queries work inside JSON."""
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
            out.extend(typed_json_terms(path, v))

    walk(col, obj)
    return sorted(out)


def json_numeric_range_query(path: str, lower=None, upper=None,
                             include_upper: bool = False):
    """Range over the TYPED numeric terms of a json path — the analog of
    the reference's JSON numeric range (query side normalizes like the
    index side, json_utils.rs:304).  Returns a BooleanQuery unioning the
    i64-typed and f64-typed subranges of the path (integral values are
    indexed under i64, the rest under f64)."""
    from ..search.query import BooleanQuery, RangeQuery
    from ..index.numeric import encode_f64, encode_i64

    # i64 leg: integer bounds equivalent to the real-valued interval
    if lower is None:
        i_lo: Optional[int] = None
    else:
        i_lo = int(math.ceil(lower))
    if upper is None:
        i_hi: Optional[int] = None
    else:
        i_hi = (int(math.floor(upper)) + 1) if include_upper \
            else int(math.ceil(upper))
    legs = []
    for code, enc, lo, hi, iu in (
        ("i", encode_i64, i_lo, i_hi, False),
        ("f", encode_f64,
         float(lower) if lower is not None else None,
         float(upper) if upper is not None else None, include_upper),
    ):
        prefix = f"{path}{TYPED_SEP}{code}"
        lo_key = prefix + (enc(lo) if lo is not None else "")
        if hi is None:
            hi_key = prefix + "g"  # 'g' > every hex digit: past the prefix
            leg_iu = False
        else:
            hi_key = prefix + enc(hi)
            leg_iu = iu
        legs.append(RangeQuery(lower=lo_key, upper=hi_key,
                               include_upper=leg_iu))
    return BooleanQuery(should=legs)


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
