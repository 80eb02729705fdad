"""Temporal operators (functions/joins.py): as-of join and hopping
window aggregates vs brute-force references on random data."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_bruteforce(self):
        import ray.data as rd

        from tantivy_ray.functions.joins import asof_join

        rs = np.random.RandomState(7)
        n_l, n_r = 300, 200
        left_rows = [{"lid": i, "user_id": int(rs.randint(0, 20)),
                      "ts": int(rs.randint(0, 10_000))}
                     for i in range(n_l)]
        right_rows = [{"user_id": int(rs.randint(0, 20)),
                       "ts": int(rs.randint(0, 10_000)),
                       "val": float(i)}
                      for i in range(n_r)]
        out = asof_join(rd.from_items(left_rows), rd.from_items(right_rows),
                        by="user_id", on="ts", value_cols=["val"])
        got = {r["lid"]: r["val_asof"] for r in out.take_all()}

        def brute(l):
            best = None
            for r in right_rows:
                if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]:
                    if best is None or r["ts"] > best["ts"] or \
                            (r["ts"] == best["ts"] and r["val"] > best["val"]):
                        best = r
            return best

        assert len(got) == n_l
        n_matched = 0
        for l in left_rows:
            b = brute(l)
            if b is None:
                assert got[l["lid"]] is None, l
            else:
                n_matched += 1
                # ties on (user, ts) are broken by sort order; values at
                # the same key+ts are interchangeable for the contract,
                # so compare the matched TS, not the value
                matched_val = got[l["lid"]]
                assert matched_val is not None, l
                cand_ts = [r["ts"] for r in right_rows
                           if r["user_id"] == l["user_id"]
                           and r["val"] == matched_val]
                assert b["ts"] in cand_ts or any(
                    t == b["ts"] for t in cand_ts), l
        assert n_matched > 100  # dense enough to be meaningful

    def test_equal_timestamp_matches(self):
        import ray.data as rd

        from tantivy_ray.functions.joins import asof_join

        left = rd.from_items([{"user_id": 1, "ts": 100, "lid": 0}])
        right = rd.from_items([{"user_id": 1, "ts": 100, "val": 7.0}])
        out = asof_join(left, right, by="user_id", on="ts",
                        value_cols=["val"]).take_all()
        assert out[0]["val_asof"] == 7.0  # "<=" semantics


@pytest.mark.usefixtures("ray_session")
class TestWindowAggregate:
    def test_tumbling_and_hopping(self):
        import ray.data as rd

        from tantivy_ray.functions.joins import window_aggregate

        rs = np.random.RandomState(3)
        ts = rs.randint(0, 100_000, size=2000)
        vals = rs.uniform(0, 10, size=2000)
        ds = rd.from_items([{"t": int(a), "v": float(b)}
                            for a, b in zip(ts, vals)])

        for window, hop in ((3600, 3600), (3600, 1800), (1000, 250)):
            out = window_aggregate(ds, "t", window, hop, value_col="v") \
                .to_pandas().set_index("window_start")
            # brute force
            from collections import defaultdict

            cnt = defaultdict(int)
            sm = defaultdict(float)
            for a, b in zip(ts, vals):
                base = (a // hop) * hop
                w = base
                while w + window > a:
                    cnt[w] += 1
                    sm[w] += b
                    w -= hop
            assert len(out) == len(cnt)
            for w, c in cnt.items():
                assert out.loc[w, "n_events"] == c
                assert out.loc[w, "sum_value"] == pytest.approx(sm[w])

    def test_keyed_windows(self):
        import ray.data as rd

        from tantivy_ray.functions.joins import window_aggregate

        rows = [{"t": 10, "u": 1}, {"t": 20, "u": 1}, {"t": 10, "u": 2}]
        out = window_aggregate(rd.from_items(rows), "t", 100, by="u") \
            .to_pandas().sort_values(["u"]).reset_index(drop=True)
        assert out["n_events"].tolist() == [2, 1]
