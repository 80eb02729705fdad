"""Aggregation framework — ES-compatible tree, partial/merge/finalize.

Re-expression of the reference's aggregation module (SURVEY §2.5;
/root/reference/src/aggregation/ — 26.9k LoC) in its essential contract:
per-shard partials are serializable and MERGEABLE across shards/nodes
(IntermediateAggregationResults, intermediate_agg_result.rs:50,251), then
``into_final_result`` shapes the response.

Supported (request dict shape mirrors the ES/reference JSON):

bucket:  terms          {field, size, sub-aggs}
         histogram      {field, interval, offset}
         date_histogram {field, fixed_interval (seconds)}
         range          {field, ranges: [{to}, {from,to}, {from}]}
         filter         {term: {field, value}}     (sub-agg scoping)
metric:  avg min max sum value_count stats extended_stats
         percentiles    (mergeable log-bucket sketch, DDSketch-style —
                         reference uses DDSketch, metric/percentiles.rs:71)
         cardinality    (HyperLogLog, reference metric/cardinality.rs:8)

Ray execution (:func:`run_aggregations`): ``map_batches`` computes one
partial per batch (vectorized numpy), partials stream to the driver and
merge pairwise — they are tiny (buckets + sketches), exactly the
merge_fruits topology the reference uses across segments and nodes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np


# ---------------------------------------------------------------------------
# mergeable sketches
# ---------------------------------------------------------------------------

class LogBucketSketch:
    """DDSketch-style quantile sketch: logarithmic buckets with relative
    accuracy alpha; mergeable by bucket-count addition."""

    __slots__ = ("alpha", "gamma", "log_gamma", "counts", "neg_counts",
                 "zero_count", "total")

    def __init__(self, alpha: float = 0.01):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self.log_gamma = math.log(self.gamma)
        self.counts: Dict[int, int] = {}
        self.neg_counts: Dict[int, int] = {}
        self.zero_count = 0
        self.total = 0

    def add_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.total += len(v)
        self.zero_count += int((v == 0).sum())
        for sign, store in ((1, self.counts), (-1, self.neg_counts)):
            vv = v[v > 0] if sign == 1 else -v[v < 0]
            if len(vv) == 0:
                continue
            keys = np.ceil(np.log(vv) / self.log_gamma).astype(np.int64)
            uniq, cnt = np.unique(keys, return_counts=True)
            for k, c in zip(uniq.tolist(), cnt.tolist()):
                store[k] = store.get(k, 0) + int(c)

    def merge(self, other: "LogBucketSketch") -> None:
        self.total += other.total
        self.zero_count += other.zero_count
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + c
        for k, c in other.neg_counts.items():
            self.neg_counts[k] = self.neg_counts.get(k, 0) + c

    def quantile(self, q: float) -> Optional[float]:
        if self.total == 0:
            return None
        rank = q * (self.total - 1)
        acc = 0
        for k in sorted(self.neg_counts, reverse=True):
            acc += self.neg_counts[k]
            if acc > rank:
                return -2 * self.gamma ** k / (self.gamma + 1)
        acc += self.zero_count
        if self.zero_count and acc > rank:
            return 0.0
        for k in sorted(self.counts):
            acc += self.counts[k]
            if acc > rank:
                return 2 * self.gamma ** k / (self.gamma + 1)
        return None

    def to_state(self):
        return ("sketch", self.alpha, dict(self.counts),
                dict(self.neg_counts), self.zero_count, self.total)

    @classmethod
    def from_state(cls, st):
        s = cls(st[1])
        s.counts, s.neg_counts, s.zero_count, s.total = (
            dict(st[2]), dict(st[3]), st[4], st[5])
        return s


class HyperLogLog:
    """HLL with 2^p registers (reference uses the datasketches hll)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of rest + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        mask = np.uint64(1 << 63)
        done = np.zeros(len(h), dtype=bool)
        for i in range(64 - self.p + 1):
            top = (cur & mask) != 0
            newly = top & ~done
            lz[newly] = i + 1
            done |= top
            if done.all():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)

    def add_values(self, values) -> None:
        import hashlib

        hs = np.array(
            [int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "big") for v in values],
            dtype=np.uint64,
        )
        if len(hs):
            self.add_hashed(hs)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.power(2.0, self.registers.astype(np.float64)).sum()
        e = alpha * m * m * z
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)
        return e

    def to_state(self):
        return ("hll", self.p, self.registers.tobytes())

    @classmethod
    def from_state(cls, st):
        h = cls(st[1])
        h.registers = np.frombuffer(st[2], dtype=np.uint8).copy()
        return h


# ---------------------------------------------------------------------------
# partial computation (per batch) and merge
# ---------------------------------------------------------------------------

_METRICS = {"avg", "min", "max", "sum", "value_count", "stats",
            "extended_stats", "percentiles", "cardinality", "top_hits"}
_BUCKETS = {"terms", "histogram", "date_histogram", "range", "filter",
            "composite"}


class AggregationLimitsError(Exception):
    """Bucket budget exceeded (reference src/aggregation/agg_limits.rs
    AggregationLimitsGuard: aborts runaway high-cardinality aggregations
    instead of OOMing the process)."""


DEFAULT_MAX_BUCKETS = 65_536


def count_buckets(partial: Dict) -> int:
    """Total buckets in a partial tree (the limits-guard metric)."""
    total = 0
    for p in partial.values():
        if not isinstance(p, tuple):
            continue
        if p[0] == "b":
            total += len(p[2])
            for b in p[2].values():
                total += count_buckets(b.get("sub", {}))
        elif p[0] == "f":
            total += 1 + count_buckets(p[2])
    return total


def check_limits(partial: Dict, max_buckets: int = DEFAULT_MAX_BUCKETS):
    n = count_buckets(partial)
    if n > max_buckets:
        raise AggregationLimitsError(
            f"aggregation produced {n} buckets, exceeding the "
            f"max_buckets budget of {max_buckets}")


def _top_hits_sort_key(spec: Dict):
    """Deterministic TOTAL order for top_hits rows: sort key, then the
    explicit tie_field when given, then the full row content — so the
    result is independent of partial/merge order even when sort values
    tie (repo determinism invariant)."""
    desc = spec.get("descending", True)
    tie = spec.get("tie_field")

    def key(r: Dict):
        primary = -r["_key"] if desc else r["_key"]
        content = tuple(
            (f, str(r[f])) for f in sorted(r) if f != "_key")
        if tie:
            return (primary, str(r[tie]), content)
        return (primary, content)

    return key


def _top_hits_partial(spec: Dict, batch: Dict, sel: np.ndarray):
    """top_hits (reference metric/top_hits.rs:117): keep the k best rows
    by sort field; partial = a plain top-k list, merged by re-ranking.
    Partial and merge cut under the same total order (_top_hits_sort_key)
    so results are merge-order independent."""
    sort_field = spec["sort_field"]
    size = spec.get("size", 3)
    desc = spec.get("descending", True)
    fields = list(spec.get("fields", [sort_field]))
    tie = spec.get("tie_field")
    if tie and tie not in fields:
        fields.append(tie)
    docv = {f: np.asarray(batch[f])[sel] for f in fields}
    keys = np.asarray(batch[sort_field], dtype=np.float64)[sel]
    if len(keys) == 0:
        return ("tophits", [])
    # vectorized pre-cut: keep everything tying with the size-th key so
    # the python total-order sort below sees all potential winners
    if len(keys) > size:
        srt = np.sort(keys)
        kth = srt[len(keys) - size] if desc else srt[size - 1]
        keep = keys >= kth if desc else keys <= kth
    else:
        keep = np.ones(len(keys), dtype=bool)
    idx = np.flatnonzero(keep)
    rows = [
        {f: (v[i].item() if hasattr(v[i], "item") else v[i])
         for f, v in docv.items()} | {"_key": float(keys[i])}
        for i in idx
    ]
    rows.sort(key=_top_hits_sort_key(spec))
    return ("tophits", rows[:size])


def _top_hits_merge(spec: Dict, a, b):
    size = spec.get("size", 3)
    rows = a[1] + b[1]
    rows.sort(key=_top_hits_sort_key(spec))
    return ("tophits", rows[:size])


def _is_multivalued(col: np.ndarray) -> bool:
    """True for a list<T> fast-field column (reference columnar
    Multivalued cardinality, columnar/src/lib.rs:83-92): Ray's numpy
    batch format hands these over as object arrays of per-doc arrays."""
    if col.dtype != object:
        return False
    for v in col:
        if v is None:
            continue
        return isinstance(v, (list, tuple, np.ndarray))
    return False


def _explode_unique_per_doc(col: np.ndarray, sel: np.ndarray,
                            miss) -> tuple:
    """(flat_values, src_rows) of UNIQUE (doc, value) pairs for selected
    rows — each distinct value counts one doc, duplicate values within a
    doc are dropped (reference block_accessor.rs:95
    fetch_block_with_missing_unique_per_doc).  Docs with no values take
    the ``missing`` key once when given, else vanish (ES default)."""
    sel_rows = np.flatnonzero(sel)
    vals = []
    lens = np.zeros(len(sel_rows), dtype=np.int64)
    for j, i in enumerate(sel_rows):
        v = col[i]
        if v is None:
            continue
        a = np.asarray(v)
        if a.size:
            vals.append(a)
            lens[j] = a.size
    flat = np.concatenate(vals) if vals else np.empty(0, dtype=object)
    rows = np.repeat(sel_rows, lens)
    if len(flat):
        import pandas as pd

        keep = ~pd.DataFrame({"r": rows, "v": flat}).duplicated().to_numpy()
        flat, rows = flat[keep], rows[keep]
    if miss is not None:
        empty_rows = sel_rows[lens == 0]
        if len(empty_rows):
            flat = np.concatenate([
                flat.astype(object),
                np.full(len(empty_rows), miss, dtype=object)])
            rows = np.concatenate([rows, empty_rows])
    return flat, rows


def _null_mask(col: np.ndarray) -> np.ndarray:
    """True where a column value is missing (None / NaN / NaT)."""
    if col.dtype == object or str(col.dtype).startswith(("datetime", "<M8")):
        import pandas as pd

        return np.asarray(pd.isnull(col))
    if col.dtype.kind == "f":
        return np.isnan(col)
    return np.zeros(len(col), dtype=bool)


def _metric_partial(kind: str, spec: Dict, values: np.ndarray):
    # ES/reference `missing` parameter (metric/*.rs `pub missing`):
    # substitute for absent values; default skips them
    miss = spec.get("missing")
    if _is_multivalued(values):
        # multivalued fast field: metrics run over ALL values
        # (reference columnar Multivalued — each value feeds the agg);
        # a doc with no values contributes `missing` once when given
        nulls = np.fromiter((v is None or len(v) == 0 for v in values),
                            dtype=bool, count=len(values))
        parts = [np.asarray(v) for v in values[~nulls]]
        flat = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.float64))
        if miss is not None and nulls.any():
            fill = np.full(int(nulls.sum()), miss)
            try:
                flat = np.concatenate([flat, fill])
            except (TypeError, ValueError):
                flat = np.concatenate([flat.astype(object),
                                       fill.astype(object)])
        values = flat
    null = _null_mask(values)
    if null.any():
        if miss is not None:
            if values.dtype == object:
                values = np.array(
                    [miss if m else v for v, m in zip(values, null)],
                    dtype=object)
            elif values.dtype.kind == "M":
                # datetime64: float(miss) cannot combine with NaT — coerce
                # the substitute to the column's datetime dtype
                values = np.where(
                    null, np.datetime64(miss).astype(values.dtype), values)
            else:
                values = np.where(null, float(miss), values)
        else:
            values = values[~null]
    if kind == "cardinality":
        h = HyperLogLog(spec.get("precision", 12))
        h.add_values(values.tolist())
        return h.to_state()
    if kind == "percentiles":
        s = LogBucketSketch(spec.get("alpha", 0.005))
        s.add_many(values)
        return s.to_state()
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return (0, 0.0, math.inf, -math.inf, 0.0)
    return (len(v), float(v.sum()), float(v.min()), float(v.max()),
            float((v * v).sum()))


def _metric_merge(kind: str, a, b, spec=None):
    if kind == "top_hits":
        return _top_hits_merge(spec or {}, a, b)
    if kind == "cardinality":
        h = HyperLogLog.from_state(a)
        h.merge(HyperLogLog.from_state(b))
        return h.to_state()
    if kind == "percentiles":
        s = LogBucketSketch.from_state(a)
        s.merge(LogBucketSketch.from_state(b))
        return s.to_state()
    return (a[0] + b[0], a[1] + b[1], min(a[2], b[2]), max(a[3], b[3]),
            a[4] + b[4])


def _metric_final(kind: str, spec: Dict, st):
    if kind == "top_hits":
        hits = [{k: v for k, v in r.items() if k != "_key"} for r in st[1]]
        return {"hits": hits}
    if kind == "cardinality":
        return {"value": round(HyperLogLog.from_state(st).estimate())}
    if kind == "percentiles":
        s = LogBucketSketch.from_state(st)
        pts = spec.get("percents", [1, 5, 25, 50, 75, 95, 99])
        return {"values": {str(p): s.quantile(p / 100.0) for p in pts}}
    n, total, mn, mx, sq = st
    if kind == "value_count":
        return {"value": n}
    if n == 0:
        return {"value": None}
    if kind == "avg":
        return {"value": total / n}
    if kind == "min":
        return {"value": mn}
    if kind == "max":
        return {"value": mx}
    if kind == "sum":
        return {"value": total}
    base = {"count": n, "min": mn, "max": mx, "sum": total, "avg": total / n}
    if kind == "stats":
        return base
    variance = sq / n - (total / n) ** 2
    base.update({
        "sum_of_squares": sq,
        "variance": variance,
        "std_deviation": math.sqrt(max(0.0, variance)),
    })
    return base  # extended_stats


def compute_partial(aggs: Dict[str, Dict], batch: Dict[str, np.ndarray],
                    mask: Optional[np.ndarray] = None) -> Dict:
    """One serializable partial for a batch (dict of numpy columns)."""
    out: Dict[str, Any] = {}
    n = len(next(iter(batch.values()))) if batch else 0
    sel = np.ones(n, dtype=bool) if mask is None else mask
    for name, spec in aggs.items():
        kind = next(k for k in spec if k in _METRICS | _BUCKETS)
        body = spec[kind]
        subs = spec.get("aggs", {})
        if kind == "top_hits":
            out[name] = ("m", kind, _top_hits_partial(body, batch, sel))
            continue
        if kind in _METRICS:
            out[name] = ("m", kind,
                         _metric_partial(kind, body, batch[body["field"]][sel]))
            continue
        if kind == "filter":
            f = body["term"]
            m2 = sel & (batch[f["field"]] == f["value"])
            out[name] = ("f", int(m2.sum()),
                         compute_partial(subs, batch, m2))
            continue
        if kind == "composite":
            out[name] = ("b", kind,
                         _composite_partial(body, subs, batch, sel), {})
            continue
        # bucket aggs: compute bucket key per row
        col = batch[body["field"]]
        if kind in ("terms", "histogram", "date_histogram"):
            if kind == "terms" and _is_multivalued(col):
                # multivalued terms agg: unique (doc, value) pairs — each
                # distinct value counts the doc once (reference
                # block_accessor.rs:95); src_rows routes sub-aggs back to
                # the source docs
                keyed_flat, src_rows = _explode_unique_per_doc(
                    col, sel, body.get("missing"))
            else:
                # bsel is local to THIS agg: null-skipping must not leak
                # into sibling aggregations sharing the caller's mask
                bsel = sel
                null = _null_mask(col)
                if null.any():
                    miss = body.get("missing")
                    if miss is not None:
                        # reference term_agg `missing` key: absent values
                        # bucket under the given key
                        keyed_fill = col.copy()
                        keyed_fill[null] = miss
                        col = keyed_fill
                    else:
                        bsel = sel & ~null  # ES default: skip null docs
                if kind == "terms":
                    keyed = col
                elif (kind == "date_histogram"
                      and body.get("calendar_interval")):
                    keyed = _calendar_bucket(col,
                                             body["calendar_interval"])
                else:
                    interval = (body.get("interval")
                                or body.get("fixed_interval"))
                    off = body.get("offset", 0)
                    vals = col.astype(np.float64)
                    keyed = (np.floor((vals - off) / interval) * interval
                             + off)
                sel_idx = np.flatnonzero(bsel)
                keyed_flat = keyed[sel_idx]
                src_rows = sel_idx
            # one pass: unique keys + inverse codes + bincount doc counts
            # (the round-1 per-key boolean mask was O(uniques x rows))
            uniq, inv = np.unique(keyed_flat, return_inverse=True)
            counts = np.bincount(inv, minlength=len(uniq))
            buckets: Dict[Any, Dict] = {}
            if subs:
                # sub-agg routing via sorted-group offsets (one stable
                # argsort, per-bucket index slices)
                order = np.argsort(inv, kind="stable")
                offsets = np.concatenate(
                    ([0], np.cumsum(counts.astype(np.int64))))
            for u_i, key in enumerate(uniq):
                k = key.item() if isinstance(key, np.generic) else key
                if kind != "terms":
                    k = float(key)
                if subs:
                    m2 = np.zeros(len(sel), dtype=bool)
                    m2[src_rows[order[offsets[u_i]:offsets[u_i + 1]]]] = True
                    sub = compute_partial(subs, batch, m2)
                else:
                    sub = {}
                buckets[k] = {"doc_count": int(counts[u_i]), "sub": sub}
            meta: Dict[str, Any] = {}
            shard_size = body.get("shard_size") if kind == "terms" else None
            if shard_size is not None and len(buckets) > shard_size:
                # per-shard truncation (ES shard_size semantics): keep the
                # top shard_size by (count desc, key asc) and remember the
                # smallest kept count — the doc_count_error contribution
                # of this shard for buckets it did NOT report
                kept = sorted(buckets.items(),
                              key=lambda kv: (-kv[1]["doc_count"],
                                              str(kv[0])))[:shard_size]
                buckets = dict(kept)
                meta["min_kept"] = int(kept[-1][1]["doc_count"])
                for b in buckets.values():
                    b.setdefault("err", 0)
            elif shard_size is not None:
                meta["min_kept"] = 0
                for b in buckets.values():
                    b.setdefault("err", 0)
            out[name] = ("b", kind, buckets, meta)
            continue
        if kind == "range":
            vals = col.astype(np.float64)
            buckets = {}
            # key carries the request-order range index so finalize can
            # emit buckets in the requested order (ES/reference behavior),
            # not label-lexicographic order
            for ri, r in enumerate(body["ranges"]):
                lo = r.get("from", -math.inf)
                hi = r.get("to", math.inf)
                m2 = sel & (vals >= lo) & (vals < hi)
                label = f"{r.get('from', '*')}-{r.get('to', '*')}"
                buckets[(ri, label)] = {
                    "doc_count": int(m2.sum()),
                    "sub": compute_partial(subs, batch, m2),
                }
            out[name] = ("b", kind, buckets, {})
            continue
        raise ValueError(f"unknown aggregation {kind}")
    return out


def _calendar_bucket(col: np.ndarray, interval: str) -> np.ndarray:
    """date_histogram calendar_interval (reference
    bucket/histogram/date_histogram.rs:34; ES semantics, UTC): epoch-
    second values → epoch seconds of the enclosing calendar period
    start.  month/year/day/hour truncate via datetime64 units; week
    starts on Monday (epoch day 0 = Thursday, hence the +3 shift)."""
    secs = np.asarray(col).astype(np.int64)
    dt = secs.astype("datetime64[s]")
    unit = {"hour": "h", "day": "D", "month": "M", "year": "Y"}.get(interval)
    if unit is not None:
        trunc = dt.astype(f"datetime64[{unit}]")
    elif interval == "week":
        days = dt.astype("datetime64[D]").astype(np.int64)
        monday = ((days + 3) // 7) * 7 - 3
        trunc = monday.astype("datetime64[D]")
    else:
        raise ValueError(f"calendar_interval {interval!r}")
    return trunc.astype("datetime64[s]").astype(np.int64).astype(np.float64)


def _composite_sources(body: Dict) -> List:
    """[(source_name, source_kind, source_body), ...] in request order."""
    out = []
    for src in body["sources"]:
        (sname, sdef), = src.items()
        (skind, sbody), = sdef.items()
        out.append((sname, skind, sbody))
    return out


def _composite_partial(body: Dict, subs: Dict, batch: Dict,
                       sel: np.ndarray) -> Dict:
    """Composite buckets (reference bucket/composite/mod.rs:201): the
    cartesian key tuples actually present in the selection, each with
    doc_count + sub-agg partials.  Pagination (size/after) happens at
    finalize — partials keep every present tuple so merge stays exact."""
    sources = _composite_sources(body)
    sel_idx = np.flatnonzero(sel)
    if len(sel_idx) == 0:
        return {}
    cols = []
    for sname, skind, sbody in sources:
        col = np.asarray(batch[sbody["field"]])[sel_idx]
        if skind in ("histogram", "date_histogram"):
            interval = sbody.get("interval") or sbody.get("fixed_interval")
            off = sbody.get("offset", 0)
            vals = col.astype(np.float64)
            col = np.floor((vals - off) / interval) * interval + off
        elif skind != "terms":
            raise ValueError(f"composite source kind {skind}")
        cols.append(col)
    import pandas as pd

    df = pd.DataFrame({i: c for i, c in enumerate(cols)})
    grouped = df.groupby(list(range(len(cols))), sort=False).indices
    buckets: Dict = {}
    for key, idx in grouped.items():
        key_t = key if isinstance(key, tuple) else (key,)
        key_t = tuple(k.item() if isinstance(k, np.generic) else k
                      for k in key_t)
        if subs:
            m2 = np.zeros(len(sel), dtype=bool)
            m2[sel_idx[idx]] = True
            sub = compute_partial(subs, batch, m2)
        else:
            sub = {}
        buckets[key_t] = {"doc_count": int(len(idx)), "sub": sub}
    return buckets


def merge_partials(aggs: Dict[str, Dict], a: Dict, b: Dict) -> Dict:
    out = {}
    for name, spec in aggs.items():
        kind = next(k for k in spec if k in _METRICS | _BUCKETS)
        subs = spec.get("aggs", {})
        pa_, pb = a.get(name), b.get(name)
        if pa_ is None:
            out[name] = pb
            continue
        if pb is None:
            out[name] = pa_
            continue
        if pa_[0] == "m":
            out[name] = ("m", kind,
                         _metric_merge(kind, pa_[2], pb[2], spec.get(kind)))
        elif pa_[0] == "f":
            out[name] = ("f", pa_[1] + pb[1],
                         merge_partials(subs, pa_[2], pb[2]))
        else:
            meta_a = pa_[3] if len(pa_) > 3 else {}
            meta_b = pb[3] if len(pb) > 3 else {}
            min_a = meta_a.get("min_kept")
            min_b = meta_b.get("min_kept")
            track_err = min_a is not None or min_b is not None
            buckets = {}
            for key, ba in pa_[2].items():
                bb = pb[2].get(key)
                if bb is not None:
                    merged = {
                        "doc_count": ba["doc_count"] + bb["doc_count"],
                        "sub": merge_partials(subs, ba["sub"], bb["sub"]),
                    }
                    if track_err:
                        merged["err"] = ba.get("err", 0) + bb.get("err", 0)
                else:
                    merged = dict(ba)
                    if track_err:
                        # absent from B: B's kept floor bounds the miss
                        merged["err"] = ba.get("err", 0) + (min_b or 0)
                buckets[key] = merged
            for key, bb in pb[2].items():
                if key not in pa_[2]:
                    merged = dict(bb)
                    if track_err:
                        merged["err"] = bb.get("err", 0) + (min_a or 0)
                    buckets[key] = merged
            meta: Dict = {}
            if track_err:
                meta["min_kept"] = (min_a or 0) + (min_b or 0)
            out[name] = ("b", kind, buckets, meta)
    return out


def finalize(aggs: Dict[str, Dict], partial: Dict) -> Dict:
    out = {}
    for name, spec in aggs.items():
        kind = next(k for k in spec if k in _METRICS | _BUCKETS)
        body = spec[kind]
        subs = spec.get("aggs", {})
        p = partial.get(name)
        if p is None:
            out[name] = {}
            continue
        if p[0] == "m":
            out[name] = _metric_final(kind, body, p[2])
        elif p[0] == "f":
            res = {"doc_count": p[1]}
            res.update(finalize(subs, p[2]))
            out[name] = res
        elif kind == "composite":
            out[name] = _composite_finalize(body, subs, p[2])
        else:
            items = list(p[2].items())
            meta = p[3] if len(p) > 3 else {}
            if kind == "terms":
                size = body.get("size", 10)
                min_dc = body.get("min_doc_count", 1)
                if min_dc > 1:
                    items = [kv for kv in items
                             if kv[1]["doc_count"] >= min_dc]
                order = body.get("order")
                if order:
                    # custom order (reference term_agg CustomOrder):
                    # {"_key"|"_count"|<sub-metric name>: "asc"|"desc"}
                    (okey, odir), = order.items()
                    rev = odir == "desc"
                    # compare _key with the native type when every key is
                    # numeric (str() would order 10 before 2); bool is not
                    # "numeric" here — it str-sorts with its terms
                    numeric = items and all(
                        isinstance(kv[0], (int, float))
                        and not isinstance(kv[0], bool) for kv in items)
                    kfn = ((lambda kv: kv[0]) if numeric
                           else (lambda kv: str(kv[0])))
                    if okey == "_key":
                        items.sort(key=kfn, reverse=rev)
                    else:
                        if okey == "_count":
                            def primary(kv):
                                return kv[1]["doc_count"]
                        else:
                            def primary(kv, okey=okey):
                                f = finalize(subs, kv[1]["sub"]).get(okey, {})
                                v = f.get("value")
                                return v if v is not None else float("-inf")
                        # ES/reference tie rule: equal primary values break
                        # by key ASC regardless of the primary's direction —
                        # two stable passes, key first, then primary
                        items.sort(key=kfn)
                        items.sort(key=primary, reverse=rev)
                else:
                    # ES default order: doc_count desc, key asc
                    items.sort(key=lambda kv: (-kv[1]["doc_count"],
                                               str(kv[0])))
                items = items[:size]
            elif kind == "range":
                # keys are (request_index, label): requested order
                items.sort(key=lambda kv: kv[0][0])
            else:
                items = _histogram_bounds_items(body, items)
            buckets = []
            show_err = body.get("show_term_doc_count_error", False)
            for key, b in items:
                if kind == "range":
                    key = key[1]
                row = {"key": key, "doc_count": b["doc_count"]}
                if kind == "terms" and show_err:
                    row["doc_count_error_upper_bound"] = b.get("err", 0)
                row.update(finalize(subs, b["sub"]))
                buckets.append(row)
            res = {"buckets": buckets}
            if kind == "terms" and meta.get("min_kept") is not None:
                res["doc_count_error_upper_bound"] = meta["min_kept"]
            out[name] = res
    return out


def _histogram_bounds_items(body: Dict, items: List) -> List:
    """Histogram finalize: sort by key; honor extended_bounds (force the
    key range, filling empty buckets), hard_bounds (clip), and
    min_doc_count=0 gap filling (reference bucket/histogram/histogram.rs:
    93 — ES semantics; default min_doc_count=1 keeps the sparse
    observed-keys behavior of the SQL oracles)."""
    interval = body.get("interval") or body.get("fixed_interval")
    ext = body.get("extended_bounds")
    hard = body.get("hard_bounds")
    min_dc = body.get("min_doc_count", 0 if ext else 1)
    items.sort(key=lambda kv: kv[0])
    if interval is None:  # calendar intervals: observed keys only
        if min_dc > 0:
            items = [kv for kv in items if kv[1]["doc_count"] >= min_dc]
        return items
    off = body.get("offset", 0)

    # All matching happens in INTEGER bucket-index space: the grid key
    # lo + i*interval can differ from the observed key
    # floor((v-off)/interval)*interval + off by 1 ulp for fractional
    # intervals, so raw float-key equality silently drops real buckets.
    def idx_of(k):  # exact bucket key -> integer bucket index
        return int(round((k - off) / interval))

    def floor_idx(x):  # raw value -> index of its containing bucket
        return int(math.floor((x - off) / interval))

    idx_all = [idx_of(kv[0]) for kv in items]
    # data range BEFORE clipping: hard_bounds limit the emitted range but
    # gap filling spans the (clipped) observed data range (ES semantics)
    if hard:
        lo_h, hi_h = floor_idx(hard["min"]), floor_idx(hard["max"])
        items = [kv for kv in items if lo_h <= idx_of(kv[0]) <= hi_h]
    if min_dc == 0 or ext:
        lo = min(idx_all) if idx_all else None
        hi = max(idx_all) if idx_all else None
        if ext:
            lo_e, hi_e = floor_idx(ext["min"]), floor_idx(ext["max"])
            lo = lo_e if lo is None else min(lo, lo_e)
            hi = hi_e if hi is None else max(hi, hi_e)
        if hard:
            lo = max(lo, floor_idx(hard["min"]))
            hi = min(hi, floor_idx(hard["max"]))
        if lo is not None:
            have = {idx_of(k): (k, v) for k, v in items}
            items = []
            for i in range(lo, hi + 1):
                hit = have.get(i)
                items.append(hit if hit is not None else
                             (i * interval + off,
                              {"doc_count": 0, "sub": {}}))
    if min_dc > 0:
        items = [kv for kv in items if kv[1]["doc_count"] >= min_dc]
    return items


def _composite_key_sorters(body: Dict):
    sources = _composite_sources(body)
    orders = [sbody.get("order", "asc") for _, _, sbody in sources]
    return sources, orders


def _composite_finalize(body: Dict, subs: Dict, buckets: Dict) -> Dict:
    """Composite pagination: buckets sorted by the composite key (per-
    source asc/desc), resumed strictly after ``after`` when given, first
    ``size`` buckets emitted plus ``after_key`` (reference
    bucket/composite/mod.rs:201 CompositeAggregation)."""
    sources, orders = _composite_key_sorters(body)
    size = body.get("size", 10)
    items = list(buckets.items())
    # stable multi-key sort honoring per-source direction (last→first)
    for i in range(len(sources) - 1, -1, -1):
        items.sort(key=lambda kv, i=i: kv[0][i],
                   reverse=(orders[i] == "desc"))
    after = body.get("after")
    if after is not None:
        after_t = tuple(after[sname] for sname, _, _ in sources)

        def beyond(key: tuple) -> bool:
            for i, (k, a) in enumerate(zip(key, after_t)):
                if k == a:
                    continue
                gt = k > a
                return gt if orders[i] == "asc" else not gt
            return False  # equal to after → excluded

        items = [kv for kv in items if beyond(kv[0])]
    items = items[:size]
    out_buckets = []
    for key, b in items:
        row = {"key": {sname: key[i]
                       for i, (sname, _, _) in enumerate(sources)},
               "doc_count": b["doc_count"]}
        row.update(finalize(subs, b["sub"]))
        out_buckets.append(row)
    res = {"buckets": out_buckets}
    if out_buckets:
        res["after_key"] = out_buckets[-1]["key"]
    return res


def run_aggregations(ds, aggs: Dict[str, Dict],
                     batch_size: int = 65536,
                     max_buckets: int = DEFAULT_MAX_BUCKETS) -> Dict:
    """Execute an aggregation tree over a ray.data.Dataset.

    map_batches → one tiny partial per batch → merge on the driver →
    finalize (the reference's collect_segment / merge_fruits /
    into_final_result trichotomy).  ``max_buckets`` is the
    AggregationLimitsGuard budget (src/aggregation/agg_limits.rs):
    every per-batch partial and the running merge are checked, so a
    runaway high-cardinality terms agg aborts instead of OOMing."""
    return finalize(aggs, aggregate_partials(ds, aggs, batch_size,
                                             max_buckets))


def aggregate_partials(ds, aggs: Dict[str, Dict],
                       batch_size: int = 65536,
                       max_buckets: int = DEFAULT_MAX_BUCKETS,
                       tree_threshold: int = 256,
                       tree_width: int = 32) -> Dict:
    """Run the distributed partial+merge phases ONCE and return the
    merged intermediate (finalize separately — e.g. composite after-key
    pagination re-finalizes many pages from one cached partial instead
    of re-running the whole aggregation per page).

    The final merge is driver-side SEQUENTIAL while the partial count is
    small (identical merge order and float behavior at test scale); past
    ``tree_threshold`` partials, distributed tree-reduce rounds
    (``map_batches`` merging ``tree_width`` partials per task) shrink
    the set first — at web scale the driver never folds 10^5 partials
    one by one (partial merges are associative: sums/counts exact,
    sketch merges are bucket/register-wise maxima or additions)."""
    from .utils import remote_args

    def partial_fn(batch: Dict[str, np.ndarray]) -> Dict[str, list]:
        import pickle

        p = compute_partial(aggs, batch)
        check_limits(p, max_buckets)
        return {"partial": np.array([pickle.dumps(p)], dtype=object)}

    parts = ds.map_batches(
        partial_fn, batch_format="numpy", batch_size=batch_size,
        **remote_args(),
    )
    import pickle

    def merge_block(batch: Dict[str, np.ndarray]) -> Dict[str, list]:
        ps = [pickle.loads(b) for b in batch["partial"]]
        m = ps[0]
        for p in ps[1:]:
            m = merge_partials(aggs, m, p)
            check_limits(m, max_buckets)
        return {"partial": np.array([pickle.dumps(m)], dtype=object)}

    # materialize: count() + the consuming loop must not re-execute the
    # tokenizing/scanning upstream (partials are tiny)
    parts = parts.materialize()
    n = parts.count()
    while n > tree_threshold:
        parts = parts.map_batches(
            merge_block, batch_format="numpy", batch_size=tree_width,
            **remote_args(),
        ).materialize()
        n_next = parts.count()
        if n_next >= n:  # safety: no progress → fall through to driver
            break
        n = n_next

    merged: Optional[Dict] = None
    for row in parts.iter_rows():
        p = pickle.loads(row["partial"])
        merged = p if merged is None else merge_partials(aggs, merged, p)
        check_limits(merged, max_buckets)
    return merged if merged is not None else {}

# ---------------------------------------------------------------------------
# Distributed exact order statistics (histogram bracketing)
# ---------------------------------------------------------------------------

def exact_order_statistics(ds, field: str, ranks_fn,
                           n_bins: int = 4096,
                           fetch_cap: int = 1_000_000,
                           max_depth: int = 4):
    """Exact order statistics of ``ds[field]`` without materializing the
    column on the driver.

    ``ranks_fn(n) -> iterable[int]`` maps the column's non-NaN count to
    the 0-based global ranks wanted.  Three streaming passes: a stats
    aggregate (count/min/max), a mergeable fixed-interval histogram that
    brackets each rank to one bucket, then a filtered fetch of ONLY the
    bracketed buckets (expected ``n / n_bins`` rows each).  Buckets
    heavier than ``fetch_cap`` recurse with a fresh histogram inside the
    bucket (pathological skew), up to ``max_depth`` levels; at the depth
    limit the bucket is fetched regardless, preferring a large driver
    pull over a wrong answer.  Returns ``(values, n)`` with ``values``
    a dict rank -> float.

    This is the scale path for gates/tests that need exact quantiles
    (production percentiles use the mergeable sketch): the driver never
    holds more than the fetched buckets.
    """
    s = run_aggregations(ds, {"s": {"stats": {"field": field}}})["s"]
    n = int(s["count"])
    out: Dict[int, float] = {}
    if n == 0:
        return out, 0
    targets = [(int(r), int(r)) for r in sorted(set(ranks_fn(n)))]
    for r, _ in targets:
        if not 0 <= r < n:
            raise ValueError(f"rank {r} out of range for n={n}")
    _order_stats_resolve(ds, field, targets, out,
                         float(s["min"]), float(s["max"]),
                         n_bins, fetch_cap, max_depth)
    return out, n


def _order_stats_resolve(ds, field, targets, out, lo, hi,
                         n_bins, fetch_cap, depth) -> None:
    """Fill ``out[out_key] = value`` for ``targets`` = [(local_rank,
    out_key)] over the (possibly bucket-filtered) dataset ``ds`` whose
    ``field`` values all lie in [lo, hi]."""
    from .utils import remote_args

    if not targets:
        return
    if lo == hi or not math.isfinite(hi - lo):
        for _, okey in targets:
            out[okey] = lo
        return
    interval = (hi - lo) / n_bins
    h = run_aggregations(ds, {"h": {"histogram": {
        "field": field, "interval": interval, "offset": lo}}})["h"]["buckets"]
    keys = np.array([b["key"] for b in h], dtype=np.float64)
    counts = np.array([b["doc_count"] for b in h], dtype=np.int64)
    below = np.concatenate(([0], np.cumsum(counts)))
    by_bucket: Dict[int, List] = {}
    for r, okey in targets:
        i = int(np.searchsorted(below, r, side="right")) - 1
        by_bucket.setdefault(i, []).append((r - int(below[i]), okey))

    light = {i: t for i, t in by_bucket.items()
             if counts[i] <= fetch_cap or depth <= 0}
    heavy = {i: t for i, t in by_bucket.items() if i not in light}

    if light:
        tkeys = keys[sorted(light)]

        def fetch(batch, _lo=lo, _iv=interval, _tk=tkeys):
            v = np.asarray(batch[field], dtype=np.float64)
            v = v[~np.isnan(v)]
            k = np.floor((v - _lo) / _iv) * _iv + _lo
            m = np.isin(k, _tk)
            return {"v": v[m], "k": k[m]}

        pdf = ds.map_batches(fetch, batch_format="numpy",
                             **remote_args()).to_pandas()
        for i, tlist in light.items():
            vals = np.sort(pdf.loc[pdf["k"] == keys[i], "v"].to_numpy())
            for lr, okey in tlist:
                out[okey] = float(vals[lr])

    for i, tlist in heavy.items():
        bk = float(keys[i])

        def keep(batch, _lo=lo, _iv=interval, _bk=bk):
            v = np.asarray(batch[field], dtype=np.float64)
            v = v[~np.isnan(v)]
            k = np.floor((v - _lo) / _iv) * _iv + _lo
            return {field: v[k == _bk]}

        sub = ds.map_batches(keep, batch_format="numpy", **remote_args())
        _order_stats_resolve(sub, field, tlist, out, bk, bk + interval,
                             n_bins, fetch_cap, depth - 1)
