"""Temporal join / window operators Ray Data lacks natively.

Training-data pipelines routinely need AS-OF joins (attach the latest
prior state to each event) and hopping/tumbling window aggregates.
Ray Data has no join or window primitive, so both are expressed with
the sort + whole-block map composition used throughout this repo:

  * the sort co-locates every partition key's rows in one block (the
    same range-partition guarantee ``map_groups`` relies on);
  * the block function handles ALL keys in the block vectorized.

Partitioning assumption (documented per the north-star custom-operator
rule): one block must hold all rows of a partition key.  Keys are user/
entity ids — web-scale tables have millions of small keys, so blocks
stay balanced; a pathologically hot key is bounded by its own row count,
not the corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..utils import remote_args


def asof_join(left_ds, right_ds, by: str, on: str,
              value_cols: Sequence[str], suffix: str = "_asof"):
    """AS-OF join: each left row gains the ``value_cols`` of the LATEST
    right row with the same ``by`` key and ``right.on <= left.on``
    (DuckDB/ASOF semantics; rows with no prior right row get nulls).

    → Dataset with the left schema plus ``<col><suffix>`` columns.
    Both inputs must carry ``by`` and ``on`` (int64-comparable)."""

    # unified schema computed upfront from the input datasets so each
    # side needs ONE map stage (tag + pad together)
    l_in = dict(zip(left_ds.schema().names, left_ds.schema().types))
    r_in = dict(zip(right_ds.schema().names, right_ds.schema().types))
    unified = {by: pa.int64(), on: pa.int64(), "_side": pa.int8()}
    for c, t in l_in.items():
        if c not in (by, on):
            unified[f"_l_{c}"] = t
    for c, t in r_in.items():
        if c not in (by, on):
            unified[f"_r_{c}"] = t
    out_order = sorted(unified)

    def tag(side: int):
        prefix = "_l_" if side == 1 else "_r_"

        def fn(batch: pa.Table) -> pa.Table:
            cols = {by: batch.column(by).cast(pa.int64()),
                    on: batch.column(on).cast(pa.int64()),
                    "_side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8))}
            for name, typ in unified.items():
                if name in cols:
                    continue
                src = name[3:] if name.startswith(prefix) else None
                if src is not None and src in batch.column_names:
                    cols[name] = batch.column(src)
                else:
                    cols[name] = pa.nulls(batch.num_rows, type=typ)
            return pa.table({k: cols[k] for k in out_order})

        return fn

    left_p = left_ds.map_batches(tag(1), batch_format="pyarrow",
                                 **remote_args())
    right_p = right_ds.map_batches(tag(0), batch_format="pyarrow",
                                   **remote_args())

    value_cols = list(value_cols)

    def join_block(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        out_names = [c[3:] for c in tbl.column_names
                     if c.startswith("_l_")]
        schema_out = [(by, pa.int64()), (on, pa.int64())] + \
            [(c, tbl.column(f"_l_{c}").type) for c in out_names] + \
            [(f"{c}{suffix}", tbl.column(f"_r_{c}").type)
             for c in value_cols]
        if n == 0:
            return pa.table({name: pa.array([], type=t)
                             for name, t in schema_out})
        keys = tbl.column(by).to_numpy()
        ts = tbl.column(on).to_numpy()
        side = tbl.column("_side").to_numpy()
        # (key, ts, right-before-left at equal ts so "<=" matches)
        order = np.lexsort((side, ts, keys))
        keys_s, side_s = keys[order], side[order]
        # forward-fill the index of the last right row, reset per key
        idx = np.arange(n)
        fill = np.where(side_s == 0, idx, -1)
        fill = np.maximum.accumulate(fill)
        key_change = np.empty(n, dtype=bool)
        key_change[0] = True
        key_change[1:] = keys_s[1:] != keys_s[:-1]
        group_start = np.maximum.accumulate(np.where(key_change, idx, 0))
        valid = fill >= group_start
        left_pos = np.flatnonzero(side_s == 1)
        match = fill[left_pos]
        match_valid = valid[left_pos]
        left_orig = order[left_pos]          # rows in tbl
        right_orig = order[np.where(match_valid, match, 0)]

        cols = {
            by: pa.array(keys[left_orig], type=pa.int64()),
            on: pa.array(ts[left_orig], type=pa.int64()),
        }
        take_l = pa.array(left_orig, type=pa.int64())
        for c in out_names:
            cols[c] = tbl.column(f"_l_{c}").take(take_l)
        take_r = pa.array(
            np.where(match_valid, right_orig, -1), type=pa.int64())
        # take with -1 → null requires masking: use a null-filled take
        for c in value_cols:
            src = tbl.column(f"_r_{c}")
            taken = src.take(pa.array(
                np.where(match_valid, right_orig, 0), type=pa.int64()))
            if not match_valid.all():
                mask = pa.array(~match_valid)
                import pyarrow.compute as pc

                taken = pc.if_else(mask, pa.nulls(len(taken),
                                                  type=src.type), taken)
            cols[f"{c}{suffix}"] = taken
        return pa.table(cols)

    return (left_p.union(right_p)
            .sort(by)
            .map_batches(join_block, batch_size=None,
                         batch_format="pyarrow", **remote_args()))


def window_aggregate(ds, ts_col: str, window_s: int,
                     hop_s: Optional[int] = None,
                     value_col: Optional[str] = None,
                     by: Optional[str] = None):
    """Tumbling / hopping window aggregate over an event stream.

    Windows start at multiples of ``hop_s`` (default = ``window_s`` →
    tumbling) and span ``window_s``; an event at time t belongs to every
    window w with w <= t < w + window_s — i.e. window_s/hop_s windows.
    → Dataset of (window_start[, by], n_events[, sum_value]) — the
    fan-out happens vectorized inside map_batches, then one small
    groupby carries only per-(window, key) partial counts."""
    hop = hop_s or window_s
    k = -(-window_s // hop)  # windows per event

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols_out = {"window_start": pa.array([], type=pa.int64()),
                    "n_part": pa.array([], type=pa.int64())}
        if n == 0:
            if by:
                cols_out[by] = pa.array([], type=pa.int64())
            if value_col:
                cols_out["sum_part"] = pa.array([], type=pa.float64())
            return pa.table(cols_out)
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        base = (ts // hop) * hop
        # candidate windows: base, base-hop, ... while window covers ts
        starts = base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop
        in_win = (starts + window_s) > ts[:, None]
        rows, wins = np.nonzero(in_win)
        import pandas as pd

        df = {"window_start": starts[rows, wins]}
        if by:
            df[by] = batch.column(by).cast(pa.int64()).to_numpy()[rows]
        if value_col:
            df["v"] = batch.column(value_col).to_numpy().astype(
                np.float64)[rows]
        pdf = pd.DataFrame(df)
        group_cols = ["window_start"] + ([by] if by else [])
        agg = pdf.groupby(group_cols, sort=False).agg(
            n_part=("window_start", "size"),
            **({"sum_part": ("v", "sum")} if value_col else {}),
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum

    group_cols = ["window_start"] + ([by] if by else [])
    aggs = [Sum("n_part", alias_name="n_events")]
    if value_col:
        aggs.append(Sum("sum_part", alias_name="sum_value"))
    return (ds.map_batches(fanout, batch_format="pyarrow", **remote_args())
            .groupby(group_cols if len(group_cols) > 1 else group_cols[0])
            .aggregate(*aggs))
