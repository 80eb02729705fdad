"""Aggregation framework unit tests: partial/merge/finalize contract
(reference intermediate_agg_result.rs:50,251 — mergeable across shards),
sketch accuracy, and ES-shaped responses."""

import math

import numpy as np
import pytest

from tantivy_ray.aggregations import (
    HyperLogLog,
    LogBucketSketch,
    compute_partial,
    finalize,
    merge_partials,
)


def run_local(aggs, batches):
    merged = None
    for b in batches:
        p = compute_partial(aggs, b)
        merged = p if merged is None else merge_partials(aggs, merged, p)
    return finalize(aggs, merged or {})


def split_batches(data, n_parts):
    n = len(next(iter(data.values())))
    out = []
    for i in range(n_parts):
        sl = slice(i * n // n_parts, (i + 1) * n // n_parts)
        out.append({k: v[sl] for k, v in data.items()})
    return out


class TestMetrics:
    def setup_method(self):
        rs = np.random.RandomState(7)
        self.vals = rs.normal(100, 15, size=5000)
        self.data = {"x": self.vals}

    @pytest.mark.parametrize("n_parts", [1, 3, 7])
    def test_stats_merge_invariant(self, n_parts):
        aggs = {"s": {"extended_stats": {"field": "x"}}}
        res = run_local(aggs, split_batches(self.data, n_parts))["s"]
        assert res["count"] == 5000
        assert res["min"] == pytest.approx(self.vals.min())
        assert res["max"] == pytest.approx(self.vals.max())
        assert res["sum"] == pytest.approx(self.vals.sum(), rel=1e-12)
        assert res["avg"] == pytest.approx(self.vals.mean(), rel=1e-12)
        assert res["std_deviation"] == pytest.approx(self.vals.std(), rel=1e-6)

    def test_simple_metrics(self):
        aggs = {
            "a": {"avg": {"field": "x"}},
            "mn": {"min": {"field": "x"}},
            "mx": {"max": {"field": "x"}},
            "sm": {"sum": {"field": "x"}},
            "n": {"value_count": {"field": "x"}},
        }
        res = run_local(aggs, split_batches(self.data, 4))
        assert res["a"]["value"] == pytest.approx(self.vals.mean())
        assert res["mn"]["value"] == self.vals.min()
        assert res["mx"]["value"] == self.vals.max()
        assert res["n"]["value"] == 5000

    def test_percentiles_accuracy(self):
        aggs = {"p": {"percentiles": {"field": "x",
                                      "percents": [5, 50, 95]}}}
        res = run_local(aggs, split_batches(self.data, 5))["p"]["values"]
        for p in (5, 50, 95):
            exact = np.percentile(self.vals, p)
            assert res[str(p)] == pytest.approx(exact, rel=0.02)

    def test_cardinality_accuracy(self):
        rs = np.random.RandomState(3)
        ids = rs.randint(0, 20000, size=100_000)
        aggs = {"c": {"cardinality": {"field": "u"}}}
        res = run_local(aggs, split_batches({"u": ids}, 6))["c"]["value"]
        true = len(np.unique(ids))
        assert abs(res - true) / true < 0.05


class TestBuckets:
    def setup_method(self):
        rs = np.random.RandomState(11)
        self.data = {
            "cat": np.array(list("abcab" * 200)),
            "v": rs.uniform(0, 100, size=1000),
        }

    def test_terms_with_subagg(self):
        aggs = {"t": {"terms": {"field": "cat", "size": 2},
                      "aggs": {"s": {"sum": {"field": "v"}}}}}
        res = run_local(aggs, split_batches(self.data, 3))["t"]["buckets"]
        # 'a' 400, 'b' 400, 'c' 200 → size-2 keeps a, b (count desc, key asc)
        assert [b["key"] for b in res] == ["a", "b"]
        assert res[0]["doc_count"] == 400
        mask = self.data["cat"] == "a"
        assert res[0]["s"]["value"] == pytest.approx(self.data["v"][mask].sum())

    def test_histogram(self):
        aggs = {"h": {"histogram": {"field": "v", "interval": 25}}}
        res = run_local(aggs, split_batches(self.data, 4))["h"]["buckets"]
        assert [b["key"] for b in res] == [0.0, 25.0, 50.0, 75.0]
        assert sum(b["doc_count"] for b in res) == 1000

    def test_range_and_filter(self):
        aggs = {
            "r": {"range": {"field": "v",
                            "ranges": [{"to": 50}, {"from": 50}]}},
            "f": {"filter": {"term": {"field": "cat", "value": "c"}},
                  "aggs": {"m": {"max": {"field": "v"}}}},
        }
        res = run_local(aggs, split_batches(self.data, 2))
        cnt = {b["key"]: b["doc_count"] for b in res["r"]["buckets"]}
        assert cnt["*-50"] == int((self.data["v"] < 50).sum())
        assert res["f"]["doc_count"] == 200
        cmask = self.data["cat"] == "c"
        assert res["f"]["m"]["value"] == pytest.approx(self.data["v"][cmask].max())

    def test_range_request_order(self):
        # ES/reference preserve the request's range-definition order,
        # not label-lexicographic order ({from:5} before {from:10})
        aggs = {"r": {"range": {"field": "v",
                                "ranges": [{"to": 5}, {"from": 5, "to": 10},
                                           {"from": 10, "to": 90},
                                           {"from": 90}]}}}
        res = run_local(aggs, split_batches(self.data, 3))["r"]["buckets"]
        assert [b["key"] for b in res] == ["*-5", "5-10", "10-90", "90-*"]
        assert sum(b["doc_count"] for b in res) == 1000

    def test_top_hits_merge_order_independent_on_ties(self):
        # equal sort keys: result must not depend on partial/merge order
        data = {
            "score": np.array([5.0, 5.0, 5.0, 5.0, 1.0, 5.0]),
            "name": np.array(["e", "c", "a", "d", "z", "b"]),
        }
        aggs = {"t": {"top_hits": {"sort_field": "score", "size": 3,
                                   "fields": ["name"]}}}
        results = []
        for n_parts in (1, 2, 3, 6):
            res = run_local(aggs, split_batches(data, n_parts))
            results.append([r["name"] for r in res["t"]["hits"]])
        assert all(r == results[0] for r in results), results
        # reversed merge order must agree too
        batches = split_batches(data, 3)
        from tantivy_ray.aggregations import (compute_partial, finalize,
                                              merge_partials)
        parts = [compute_partial(aggs, b) for b in batches]
        fwd = parts[0]
        for p in parts[1:]:
            fwd = merge_partials(aggs, fwd, p)
        rev = parts[-1]
        for p in reversed(parts[:-1]):
            rev = merge_partials(aggs, rev, p)
        assert finalize(aggs, fwd) == finalize(aggs, rev) == {
            "t": {"hits": [{"name": n} for n in results[0]]}}

    def test_composite_pagination(self):
        data = {
            "cat": np.array(list("abcab" * 200)),
            "v": np.arange(1000, dtype=np.float64) % 50,
        }
        aggs = {"c": {"composite": {
            "size": 3,
            "sources": [{"cat": {"terms": {"field": "cat"}}},
                        {"vb": {"histogram": {"field": "v",
                                              "interval": 25}}}],
        }, "aggs": {"s": {"sum": {"field": "v"}}}}}
        res = run_local(aggs, split_batches(data, 4))["c"]
        keys = [(b["key"]["cat"], b["key"]["vb"]) for b in res["buckets"]]
        assert keys == [("a", 0.0), ("a", 25.0), ("b", 0.0)]
        assert res["after_key"] == {"cat": "b", "vb": 0.0}
        # page 2 via after
        aggs["c"]["composite"]["after"] = res["after_key"]
        res2 = run_local(aggs, split_batches(data, 4))["c"]
        keys2 = [(b["key"]["cat"], b["key"]["vb"]) for b in res2["buckets"]]
        assert keys2 == [("b", 25.0), ("c", 0.0), ("c", 25.0)]
        # doc counts exact: every (cat, bucket) partition sums to 1000
        total = sum(b["doc_count"] for b in res["buckets"] + res2["buckets"])
        assert total == 1000
        # sub-agg value check on one bucket
        m = (data["cat"] == "a") & (data["v"] < 25)
        assert res["buckets"][0]["s"]["value"] == pytest.approx(
            data["v"][m].sum())

    def test_composite_desc_order(self):
        data = {"cat": np.array(list("abc") * 10)}
        aggs = {"c": {"composite": {
            "size": 2,
            "sources": [{"cat": {"terms": {"field": "cat",
                                           "order": "desc"}}}],
        }}}
        res = run_local(aggs, split_batches(data, 2))["c"]
        assert [b["key"]["cat"] for b in res["buckets"]] == ["c", "b"]
        aggs["c"]["composite"]["after"] = res["after_key"]
        res2 = run_local(aggs, split_batches(data, 2))["c"]
        assert [b["key"]["cat"] for b in res2["buckets"]] == ["a"]

    def test_terms_doc_count_error_bounds(self):
        # shard A: x=30, y=20, z=10; shard B: z=25, w=15, y=5
        a = {"cat": np.array(["x"] * 30 + ["y"] * 20 + ["z"] * 10)}
        b = {"cat": np.array(["z"] * 25 + ["w"] * 15 + ["y"] * 5)}
        aggs = {"t": {"terms": {"field": "cat", "size": 4, "shard_size": 2,
                                "show_term_doc_count_error": True}}}
        res = run_local(aggs, [a, b])["t"]
        got = {bk["key"]: bk for bk in res["buckets"]}
        # shard A keeps x,y (min_kept 20); shard B keeps z,w (min_kept 15)
        assert res["doc_count_error_upper_bound"] == 35
        assert got["x"]["doc_count_error_upper_bound"] == 15  # missing in B
        assert got["z"]["doc_count_error_upper_bound"] == 20  # missing in A
        # y was truncated away on shard B: reported count misses B's 5
        assert got["y"]["doc_count"] == 20

    def test_histogram_extended_and_hard_bounds(self):
        data = {"v": np.array([12.0, 14.0, 38.0])}
        aggs = {"h": {"histogram": {"field": "v", "interval": 10,
                                    "extended_bounds": {"min": 0,
                                                        "max": 50}}}}
        res = run_local(aggs, [data])["h"]["buckets"]
        assert [b["key"] for b in res] == [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]
        assert [b["doc_count"] for b in res] == [0, 2, 0, 1, 0, 0]
        aggs = {"h": {"histogram": {"field": "v", "interval": 10,
                                    "min_doc_count": 0,
                                    "hard_bounds": {"min": 10,
                                                    "max": 25}}}}
        res = run_local(aggs, [data])["h"]["buckets"]
        assert [b["key"] for b in res] == [10.0, 20.0]
        assert [b["doc_count"] for b in res] == [2, 0]

    def test_limits_guard(self):
        from tantivy_ray.aggregations import (AggregationLimitsError,
                                              check_limits)
        data = {"k": np.arange(5000).astype(str)}
        aggs = {"t": {"terms": {"field": "k", "size": 10}}}
        p = compute_partial(aggs, data)
        with pytest.raises(AggregationLimitsError):
            check_limits(p, max_buckets=1000)
        check_limits(p, max_buckets=10000)  # under budget: no raise

    def test_terms_many_uniques_matches_bincount(self):
        # unique+bincount partial: counts identical to a naive groupby
        rs = np.random.RandomState(3)
        cat = rs.randint(0, 500, size=5000).astype(str)
        aggs = {"t": {"terms": {"field": "cat", "size": 500}}}
        res = run_local(aggs, split_batches({"cat": cat}, 4))["t"]["buckets"]
        from collections import Counter
        exp = Counter(cat.tolist())
        got = {b["key"]: b["doc_count"] for b in res}
        assert got == dict(exp)


class TestSketches:
    def test_hll_merge_equals_union(self):
        a, b = HyperLogLog(12), HyperLogLog(12)
        a.add_values(range(0, 5000))
        b.add_values(range(2500, 8000))
        a.merge(b)
        assert abs(a.estimate() - 8000) / 8000 < 0.05

    def test_sketch_merge_equals_whole(self):
        rs = np.random.RandomState(5)
        v = rs.lognormal(3, 1, 10000)
        whole = LogBucketSketch()
        whole.add_many(v)
        s1, s2 = LogBucketSketch(), LogBucketSketch()
        s1.add_many(v[:6000]); s2.add_many(v[6000:])
        s1.merge(s2)
        for q in (0.1, 0.5, 0.9):
            assert s1.quantile(q) == pytest.approx(whole.quantile(q))

    def test_negative_and_zero(self):
        s = LogBucketSketch()
        s.add_many(np.array([-10.0, -1.0, 0.0, 1.0, 10.0]))
        assert s.quantile(0.5) == pytest.approx(0.0, abs=1e-9)
        assert s.quantile(0.0) == pytest.approx(-10, rel=0.02)


@pytest.mark.usefixtures("ray_session")
class TestRayExecution:
    def test_over_dataset(self, sf_dir):
        import ray.data as rd
        import os

        from tantivy_ray.aggregations import run_aggregations

        ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_returnflag", "l_quantity"])
        res = run_aggregations(ds, {
            "flags": {"terms": {"field": "l_returnflag", "size": 5},
                      "aggs": {"q": {"avg": {"field": "l_quantity"}}}}
        }, batch_size=1000)
        assert sum(b["doc_count"] for b in res["flags"]["buckets"]) == 6000

    def test_tree_reduce_equals_sequential(self, sf_dir):
        """The distributed tree-reduce (engaged past tree_threshold
        partials — the web-scale path) merges to the same final result
        as the sequential driver fold (partial merges associative)."""
        import os

        import ray.data as rd

        from tantivy_ray.aggregations import aggregate_partials, finalize

        ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_returnflag", "l_quantity"])
        aggs = {
            "flags": {"terms": {"field": "l_returnflag", "size": 5},
                      "aggs": {"s": {"stats": {"field": "l_quantity"}}}},
            "card": {"cardinality": {"field": "l_returnflag"}},
            "pct": {"percentiles": {"field": "l_quantity",
                                    "percents": [50, 95]}},
        }
        # batch_size=100 → ~60 partials; threshold 8 forces 2+ tree rounds
        seq = finalize(aggs, aggregate_partials(ds, aggs, batch_size=100))
        tree = finalize(aggs, aggregate_partials(
            ds, aggs, batch_size=100, tree_threshold=8, tree_width=4))
        assert tree == seq


class TestTermsCustomOrder:
    def test_order_by_key_and_count(self):
        data = {"cat": np.array(list("a" * 5 + "b" * 3 + "c" * 7))}
        aggs = {"t": {"terms": {"field": "cat", "size": 10,
                                "order": {"_key": "desc"}}}}
        res = run_local(aggs, split_batches(data, 2))["t"]["buckets"]
        assert [b["key"] for b in res] == ["c", "b", "a"]
        aggs = {"t": {"terms": {"field": "cat", "size": 2,
                                "order": {"_count": "asc"}}}}
        res = run_local(aggs, split_batches(data, 2))["t"]["buckets"]
        assert [b["key"] for b in res] == ["b", "a"]

    def test_order_by_sub_metric(self):
        data = {
            "cat": np.array(["x"] * 3 + ["y"] * 3 + ["z"] * 3),
            "v": np.array([1.0, 1, 1, 9, 9, 9, 5, 5, 5]),
        }
        aggs = {"t": {"terms": {"field": "cat", "size": 3,
                                "order": {"m": "desc"}},
                      "aggs": {"m": {"avg": {"field": "v"}}}}}
        res = run_local(aggs, split_batches(data, 3))["t"]["buckets"]
        assert [b["key"] for b in res] == ["y", "z", "x"]
        assert [b["m"]["value"] for b in res] == [9.0, 5.0, 1.0]


class TestMissingAndMinDocCount:
    """Reference agg params: `missing` (term_agg/mod.rs:271 and every
    metric's `pub missing`) and terms `min_doc_count` (mod.rs:306)."""

    def _run(self, aggs, batch):
        import numpy as np

        from tantivy_ray.aggregations import (compute_partial, finalize,
                                              merge_partials)
        half = {k: v[:2] for k, v in batch.items()}
        rest = {k: v[2:] for k, v in batch.items()}
        p = merge_partials(aggs, compute_partial(aggs, half),
                           compute_partial(aggs, rest))
        return finalize(aggs, p)

    def test_terms_missing_key(self):
        import numpy as np

        batch = {"cat": np.array(["a", None, "a", None], dtype=object)}
        aggs = {"t": {"terms": {"field": "cat", "missing": "N/A"}}}
        res = self._run(aggs, batch)
        got = {b["key"]: b["doc_count"] for b in res["t"]["buckets"]}
        assert got == {"a": 2, "N/A": 2}

    def test_terms_null_dropped_by_default(self):
        import numpy as np

        batch = {"cat": np.array(["a", None, "b", None], dtype=object)}
        aggs = {"t": {"terms": {"field": "cat"}}}
        res = self._run(aggs, batch)
        got = {b["key"]: b["doc_count"] for b in res["t"]["buckets"]}
        assert got == {"a": 1, "b": 1}

    def test_metric_missing_substitutes(self):
        import numpy as np

        batch = {"v": np.array([1.0, np.nan, 3.0, np.nan])}
        aggs = {"m": {"avg": {"field": "v", "missing": 2.0}}}
        res = self._run(aggs, batch)
        assert res["m"]["value"] == 2.0  # (1+2+3+2)/4
        aggs = {"m": {"avg": {"field": "v"}}}
        res = self._run(aggs, batch)
        assert res["m"]["value"] == 2.0  # (1+3)/2 — NaN skipped

    def test_cardinality_missing(self):
        import numpy as np

        batch = {"u": np.array(["x", None, "y", None], dtype=object)}
        aggs = {"c": {"cardinality": {"field": "u", "missing": "zzz"}}}
        res = self._run(aggs, batch)
        assert res["c"]["value"] == 3
        aggs = {"c": {"cardinality": {"field": "u"}}}
        res = self._run(aggs, batch)
        assert res["c"]["value"] == 2

    def test_terms_min_doc_count(self):
        import numpy as np

        batch = {"cat": np.array(["a", "a", "b", "c"], dtype=object)}
        aggs = {"t": {"terms": {"field": "cat", "min_doc_count": 2}}}
        res = self._run(aggs, batch)
        assert [b["key"] for b in res["t"]["buckets"]] == ["a"]
