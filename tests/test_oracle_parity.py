"""Driver-style correctness harness: run every queries() entry and its
oracle_sql() side by side on sf0.01 and compare row count + sorted-column
value equality (mimics CORRECTNESS_r{N}.json)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def queries_list(names=None):
    return names


def _oracle_names():
    from tantivy_ray.pipelines.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(contract, con, name):
    fn = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    got = fn(SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = con.execute(sql).fetchdf()
    g, e = normalize(got), normalize(exp)
    assert list(g.columns) == list(e.columns), (g.columns, e.columns)
    assert len(g) == len(e), f"{name}: {len(g)} vs {len(e)} rows"
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)


def test_entry_smoke(contract):
    out = contract.entry()
    assert len(out) >= 0
    assert set(["query_id", "rank", "doc_id"]).issubset(out.columns)
