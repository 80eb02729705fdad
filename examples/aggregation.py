"""Aggregations (reference examples/aggregation.rs +
filter_aggregation.rs): terms / histogram / range buckets with metric
sub-aggregations and a filter aggregation, executed over a
ray.data.Dataset."""

import ray

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR")

import ray.data as rd

from tantivy_ray.aggregations import run_aggregations


def main():
    ds = rd.from_items([
        {"color": c, "price": p, "stock": s}
        for c, p, s in [("red", 10.0, 2), ("red", 20.0, 3),
                        ("blue", 15.0, 1), ("blue", 25.0, 7),
                        ("green", 5.0, 4)]
    ])
    res = run_aggregations(ds, {
        "by_color": {"terms": {"field": "color", "size": 10},
                     "aggs": {"avg_price": {"avg": {"field": "price"}}}},
        "price_hist": {"histogram": {"field": "price", "interval": 10}},
        "cheap": {"filter": {"term": {"field": "color", "value": "red"}},
                  "aggs": {"stock": {"sum": {"field": "stock"}}}},
        "ranges": {"range": {"field": "price",
                             "ranges": [{"to": 12}, {"from": 12}]}},
    })
    for b in res["by_color"]["buckets"]:
        print(b["key"], b["doc_count"], round(b["avg_price"]["value"], 2))
    print("red stock:", res["cheap"]["stock"]["value"])
    assert res["cheap"]["doc_count"] == 2


if __name__ == "__main__":
    main()
    ray.shutdown()
