"""Aggregation-tree queries + DuckDB oracles (SURVEY §2.5 coverage).

Each query runs the ES-style aggregation framework (tantivy_ray.aggregations)
through Ray Data and flattens the response to a table whose values a SQL
oracle reproduces exactly (integer counts; float aggregates rounded to 6dp
on BOTH sides — summation-order noise is ~1e-12)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..aggregations import run_aggregations
from ..utils import remote_args


def _read(sf_dir: str, table: str, columns):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# 1. terms bucket + stats sub-agg over lineitem ---------------------------

def q_agg_stats_by_returnflag(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    res = run_aggregations(ds, {
        "flags": {
            "terms": {"field": "l_returnflag", "size": 10},
            "aggs": {"q": {"stats": {"field": "l_quantity"}}},
        }
    })
    rows = [{
        "l_returnflag": b["key"],
        "doc_count": b["doc_count"],
        "count_q": b["q"]["count"],
        "min_q": b["q"]["min"],
        "max_q": b["q"]["max"],
        "sum_q": b["q"]["sum"],
        "avg_q": round(b["q"]["avg"], 6),
    } for b in res["flags"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_STATS_BY_RETURNFLAG = """
SELECT l_returnflag,
       count(*) AS doc_count,
       count(l_quantity) AS count_q,
       min(l_quantity) AS min_q,
       max(l_quantity) AS max_q,
       sum(l_quantity) AS sum_q,
       round(avg(l_quantity), 6) AS avg_q
FROM lineitem GROUP BY l_returnflag
"""


# 2. histogram over orders ------------------------------------------------

def q_agg_histogram_orders(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    res = run_aggregations(ds, {
        "price": {"histogram": {"field": "o_totalprice", "interval": 50000}}
    })
    rows = [{"bucket": float(b["key"]), "doc_count": b["doc_count"]}
            for b in res["price"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_HISTOGRAM_ORDERS = """
SELECT floor(o_totalprice / 50000) * 50000 AS bucket,
       count(*) AS doc_count
FROM orders GROUP BY 1
"""


# 3. date_histogram over events (per hour) -------------------------------

def q_agg_date_histogram_events(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["ts"])

    def to_epoch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        secs = pc.cast(
            pc.floor(pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                               1_000_000)),
            pa.int64(),
        )
        return pa.table({"epoch_s": secs})

    ds = ds.map_batches(to_epoch, batch_format="pyarrow", **remote_args())
    res = run_aggregations(ds, {
        "per_hour": {"date_histogram": {"field": "epoch_s",
                                        "fixed_interval": 3600}}
    })
    rows = [{"bucket": int(b["key"]), "doc_count": b["doc_count"]}
            for b in res["per_hour"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_DATE_HISTOGRAM_EVENTS = """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
       count(*) AS doc_count
FROM events GROUP BY 1
"""


# 3b. calendar-interval date_histogram (weeks, Monday start) --------------

def q_agg_calendar_histogram_events(sf_dir: str) -> pa.Table:
    """date_histogram with calendar_interval=week (reference
    date_histogram.rs:34): buckets are Monday 00:00 UTC period starts."""
    ds = _read(sf_dir, "events", ["ts"])

    def to_epoch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        secs = pc.cast(
            pc.floor(pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                               1_000_000)),
            pa.int64(),
        )
        return pa.table({"epoch_s": secs})

    ds = ds.map_batches(to_epoch, batch_format="pyarrow", **remote_args())
    res = run_aggregations(ds, {
        "per_week": {"date_histogram": {"field": "epoch_s",
                                        "calendar_interval": "week"},
                     "aggs": {"m": {"value_count": {"field": "epoch_s"}}}}
    })
    rows = [{"bucket": int(b["key"]), "doc_count": b["doc_count"],
             "n": b["m"]["value"]}
            for b in res["per_week"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_CALENDAR_HISTOGRAM_EVENTS = """
SELECT CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS bucket,
       count(*) AS doc_count,
       count(*) AS n
FROM events GROUP BY 1
"""


# 4. range buckets + avg sub-agg over events ------------------------------

def q_agg_range_events(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["value"])
    res = run_aggregations(ds, {
        "v": {
            "range": {"field": "value",
                      "ranges": [{"to": 5}, {"from": 5, "to": 20},
                                 {"from": 20}]},
            "aggs": {"m": {"avg": {"field": "value"}}},
        }
    })
    rows = [{
        "bucket": b["key"],
        "doc_count": b["doc_count"],
        "avg_value": round(b["m"]["value"], 6) if b["m"]["value"] is not None else None,
    } for b in res["v"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_RANGE_EVENTS = """
SELECT CASE WHEN value < 5 THEN '*-5'
            WHEN value < 20 THEN '5-20'
            ELSE '20-*' END AS bucket,
       count(*) AS doc_count,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1
"""


# 5. terms + filter + value_count over events -----------------------------

def q_agg_terms_events(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["event_type", "value", "user_id"])
    res = run_aggregations(ds, {
        "types": {
            "terms": {"field": "event_type", "size": 20},
            "aggs": {
                "v": {"sum": {"field": "value"}},
                "n": {"value_count": {"field": "user_id"}},
            },
        }
    })
    rows = [{
        "event_type": b["key"],
        "doc_count": b["doc_count"],
        "sum_value": round(b["v"]["value"], 6),
        "n_users": b["n"]["value"],
    } for b in res["types"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_TERMS_EVENTS = """
SELECT event_type,
       count(*) AS doc_count,
       round(sum(value), 6) AS sum_value,
       count(user_id) AS n_users
FROM events GROUP BY event_type
"""


# 5b. MULTIVALUED terms agg over a list<string> fast field ----------------
# (reference columnar Multivalued cardinality, columnar/src/lib.rs:83-92;
# unique-(doc,value) counting per block_accessor.rs:95)

def q_agg_terms_tags(sf_dir: str) -> pa.Table:
    """Terms + avg sub-agg over a MULTIVALUED column: part rows tagged
    with the words of p_name (a deterministic list<string> derived in a
    map_batches stage — the testdata ships no list columns).  Each doc
    counts once per distinct tag; sub-aggs see the docs of the bucket."""
    import pyarrow.compute as pc

    from ..utils import remote_args

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def add_tags(batch: pa.Table) -> pa.Table:
        tags = pc.split_pattern(batch.column("p_name"), " ")
        return pa.table({
            "tags": tags,
            "p_retailprice": batch.column("p_retailprice"),
        })

    tagged = ds.map_batches(add_tags, batch_format="pyarrow",
                            **remote_args())
    res = run_aggregations(tagged, {
        "by_tag": {
            "terms": {"field": "tags", "size": 10_000},
            "aggs": {"a": {"avg": {"field": "p_retailprice"}}},
        }
    })
    rows = [{
        "tag": b["key"],
        "doc_count": b["doc_count"],
        "avg_price": round(b["a"]["value"], 6),
    } for b in res["by_tag"]["buckets"]]
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_TERMS_TAGS = """
WITH pairs AS (
  SELECT DISTINCT p_partkey,
         unnest(string_split(p_name, ' ')) AS tag,
         p_retailprice
  FROM part
)
SELECT tag, count(*) AS doc_count,
       round(avg(p_retailprice), 6) AS avg_price
FROM pairs GROUP BY tag
"""


# 6. exact distinct (unique-op parity; HLL is property-tested) ------------

def q_distinct_users(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["user_id"])
    n = ds.unique("user_id")
    return pa.table({"n_users": pa.array([len(n)], type=pa.int64())})


SQL_DISTINCT_USERS = (
    "SELECT count(DISTINCT user_id) AS n_users FROM events"
)


def q_agg_cardinality_users(sf_dir: str) -> pa.Table:
    """HLL cardinality, oracle-paired as a boolean accuracy gate (VERDICT
    round-3 item 5, the ivf_recall pattern): the row carries the EXACT
    distinct count (computed by the engine's own distributed unique — the
    SQL oracle recomputes it independently with count(DISTINCT)) plus
    ``within_2pct`` asserting the HLL estimate lands within ±2%·exact."""
    ds = _read(sf_dir, "events", ["user_id"])
    res = run_aggregations(ds, {
        "c": {"cardinality": {"field": "user_id"}}
    })
    approx = int(res["c"]["value"])
    exact = len(_read(sf_dir, "events", ["user_id"]).unique("user_id"))
    return pa.table({
        "n_users_exact": pa.array([exact], type=pa.int64()),
        "within_2pct": pa.array(
            [abs(approx - exact) <= 0.02 * exact], type=pa.bool_()),
    })


SQL_AGG_CARDINALITY_USERS = (
    "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact, "
    "TRUE AS within_2pct FROM events"
)


def q_agg_percentiles_value(sf_dir: str) -> pa.Table:
    """DDSketch-style percentiles, oracle-paired as a boolean accuracy
    gate: per requested percent, ``within_bound`` asserts the sketch
    value is within the sketch's declared relative accuracy (alpha=0.01,
    plus the local inter-quantile gap that separates the sketch's
    nearest-rank answer from quantile_cont's interpolated one).  The
    exact quantiles come from distributed histogram bracketing
    (aggregations.exact_order_statistics) — only the handful of
    bracketed order statistics reach the driver, never the column."""
    from ..aggregations import exact_order_statistics

    ds = _read(sf_dir, "events", ["value"])
    percents = [25, 50, 95]
    res = run_aggregations(ds, {
        "p": {"percentiles": {"field": "value", "percents": percents}}
    })
    v = res["p"]["values"]

    def ranks_fn(n):
        rs = set()
        for p in percents:
            h = p / 100.0 * (n - 1)
            idx = int(h)
            rs |= {int(np.floor(h)), int(np.ceil(h)),
                   max(idx - 1, 0), min(idx + 1, n - 1)}
        return rs

    vals, n = exact_order_statistics(ds, "value", ranks_fn)
    rows = []
    for p in percents:
        est = float(v[str(p)])
        h = p / 100.0 * (n - 1)
        f, c = int(np.floor(h)), int(np.ceil(h))
        # np.quantile linear interpolation between order stats f and c
        exact = vals[f] + (h - f) * (vals[c] - vals[f])
        # nearest-rank vs interpolated: allow one order-statistic step
        idx = int(h)
        gap = vals[min(idx + 1, n - 1)] - vals[max(idx - 1, 0)]
        ok = abs(est - exact) <= 0.0101 * abs(exact) + gap + 1e-12
        rows.append((p, ok))
    return pa.table({
        "percent": pa.array([r[0] for r in rows], type=pa.int64()),
        "within_bound": pa.array([r[1] for r in rows], type=pa.bool_()),
    })


SQL_AGG_PERCENTILES_VALUE = (
    "SELECT CAST(p AS BIGINT) AS percent, TRUE AS within_bound "
    "FROM (VALUES (25), (50), (95)) t(p)"
)


def q_agg_top_hits(sf_dir: str) -> pa.Table:
    """top_hits metric: top-2 events by value per event_type (deterministic
    event_id tie-break) — oracle via ROW_NUMBER."""
    ds = _read(sf_dir, "events", ["event_type", "value", "event_id"])
    res = run_aggregations(ds, {
        "t": {"terms": {"field": "event_type", "size": 20},
              "aggs": {"h": {"top_hits": {"sort_field": "value", "size": 2,
                                          "fields": ["event_id", "value"],
                                          "tie_field": "event_id"}}}}
    })
    rows = []
    for b in res["t"]["buckets"]:
        for rank, h in enumerate(b["h"]["hits"]):
            rows.append((b["key"], rank, int(h["event_id"]),
                         round(float(h["value"]), 6)))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], type=pa.string()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "value": pa.array([r[3] for r in rows], type=pa.float64()),
    })


SQL_AGG_TOP_HITS = """
SELECT event_type, rank, event_id, round(value, 6) AS value FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) - 1 AS rank
  FROM events)
WHERE rank < 2
"""


# composite (paginated multi-source buckets; reference
# src/aggregation/bucket/composite/mod.rs:201) ---------------------------

COMPOSITE_PAGE = 16


def q_agg_composite_events(sf_dir: str) -> pa.Table:
    """Composite agg over (event_type, value-histogram) with after-key
    pagination: walk ALL pages (page size 4) and emit every bucket with
    its page number — exercising the after-key resume path end to end.

    The distributed partial+merge phase runs ONCE; every page is
    finalized from the cached merged partial (ES-faithfully each page is
    a fresh finalize with its after key, but re-running the whole
    aggregation per page — the round-2 shape — paid a full scan per
    page)."""
    from ..aggregations import aggregate_partials, finalize

    ds = _read(sf_dir, "events", ["event_type", "value"])
    body = {
        "size": COMPOSITE_PAGE,
        "sources": [
            {"etype": {"terms": {"field": "event_type"}}},
            {"vb": {"histogram": {"field": "value", "interval": 20}}},
        ],
    }
    aggs = {"c": {"composite": body,
                  "aggs": {"s": {"sum": {"field": "value"}}}}}
    merged = aggregate_partials(ds, aggs)
    rows = []
    page = 0
    while True:
        res = finalize(aggs, merged)["c"]
        for b in res["buckets"]:
            rows.append({
                "page": page,
                "etype": b["key"]["etype"],
                "vb": b["key"]["vb"],
                "doc_count": b["doc_count"],
                "sum_value": round(b["s"]["value"], 6),
            })
        if len(res["buckets"]) < COMPOSITE_PAGE:
            break
        body["after"] = res["after_key"]
        page += 1
    body.pop("after", None)
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


SQL_AGG_COMPOSITE_EVENTS = f"""
WITH b AS (
  SELECT event_type AS etype,
         floor(value / 20) * 20 AS vb,
         count(*) AS doc_count,
         round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2),
o AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY etype ASC, vb ASC) - 1 AS rn
  FROM b)
SELECT CAST(rn // {COMPOSITE_PAGE} AS BIGINT) AS page,
       etype, vb, doc_count, sum_value
FROM o
"""


AGG_QUERIES: Dict = {
    "agg_composite_events": q_agg_composite_events,
    "agg_top_hits": q_agg_top_hits,
    "agg_cardinality_users": q_agg_cardinality_users,
    "agg_percentiles_value": q_agg_percentiles_value,
    "agg_stats_by_returnflag": q_agg_stats_by_returnflag,
    "agg_histogram_orders": q_agg_histogram_orders,
    "agg_date_histogram_events": q_agg_date_histogram_events,
    "agg_calendar_histogram_events": q_agg_calendar_histogram_events,
    "agg_range_events": q_agg_range_events,
    "agg_terms_events": q_agg_terms_events,
    "agg_terms_tags": q_agg_terms_tags,
    "distinct_users": q_distinct_users,
}

AGG_ORACLE_SQL: Dict[str, str] = {
    "agg_composite_events": SQL_AGG_COMPOSITE_EVENTS,
    "agg_top_hits": SQL_AGG_TOP_HITS,
    "agg_stats_by_returnflag": SQL_AGG_STATS_BY_RETURNFLAG,
    "agg_histogram_orders": SQL_AGG_HISTOGRAM_ORDERS,
    "agg_date_histogram_events": SQL_AGG_DATE_HISTOGRAM_EVENTS,
    "agg_calendar_histogram_events": SQL_AGG_CALENDAR_HISTOGRAM_EVENTS,
    "agg_range_events": SQL_AGG_RANGE_EVENTS,
    "agg_terms_events": SQL_AGG_TERMS_EVENTS,
    "agg_terms_tags": SQL_AGG_TERMS_TAGS,
    "distinct_users": SQL_DISTINCT_USERS,
    "agg_cardinality_users": SQL_AGG_CARDINALITY_USERS,
    "agg_percentiles_value": SQL_AGG_PERCENTILES_VALUE,
}
