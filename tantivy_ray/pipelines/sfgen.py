"""Deterministic synthetic sf-scale tables for large benchmarks.

The driver ships read-only testdata up to sf0.1; every 100x-scale claim
needs evidence at a larger scale factor, so this module synthesizes the
same table SHAPES (documents / events / embeddings / lineitem / orders /
part — the tables the contract pipelines read) at any scale, seeded and
deterministic (same n + seed => byte-identical on any machine).  BENCH
data only: the driver's oracle sweep keeps using the shipped testdata.

Structure the generators bake in, mirroring what the contract pipelines
stress:
- documents: Zipfian token mix over a shared vocabulary; ~3% exact
  duplicate texts and ~3% near-duplicates (one token swapped) so the
  dedup pipelines (exact / minhash / allpairs / simhash) have real work;
  lang mix en/de/es/fr/zh for the multilang stemming router.
- embeddings: unit-normalized float32 vectors (dim 64) with ~2%
  near-duplicates (small perturbation, renormalized) for the
  embedding-cosine / ANN paths.
- events / lineitem / orders / part: the TPC-H-ish shapes the
  aggregation and join entries group over.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .pages import _vocab

_LANGS = np.array(["en", "de", "es", "fr", "zh"], dtype=object)
_LANG_P = [0.6, 0.12, 0.1, 0.1, 0.08]
_EVENT_TYPES = np.array(["view", "click", "signup", "purchase", "error"],
                        dtype=object)
_EVENT_P = [0.5, 0.3, 0.05, 0.05, 0.1]


def generate_documents(n: int, seed: int = 7) -> pa.Table:
    rs = np.random.RandomState(seed)
    vocab = np.array(_vocab(), dtype=object)
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    lens = rs.randint(20, 120, size=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    words = rs.choice(vocab, size=int(lens.sum()), p=probs)
    texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n)]
    # exact + near duplicates (deterministic targets into the past)
    n_dup = n // 33
    dup_dst = rs.choice(np.arange(n // 2, n), size=2 * n_dup, replace=False)
    dup_src = rs.randint(0, n // 2, size=2 * n_dup)
    for d, s in zip(dup_dst[:n_dup], dup_src[:n_dup]):
        texts[d] = texts[s]                       # exact dup
    for d, s in zip(dup_dst[n_dup:], dup_src[n_dup:]):
        toks = texts[s].split()
        if toks:
            toks[rs.randint(0, len(toks))] = "neardupmark"
        texts[d] = " ".join(toks)                 # near dup (1 token off)
    langs = rs.choice(_LANGS, size=n, p=_LANG_P)
    sources = np.array([f"src{i % 10}" for i in rs.randint(0, 10, size=n)],
                       dtype=object)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })


def generate_events(n: int, seed: int = 11) -> pa.Table:
    rs = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + np.sort(rs.randint(0, 90 * 86_400_000_000, size=n))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rs.randint(0, max(10, n // 80), size=n)
                            .astype(np.int64)),
        "event_type": pa.array(rs.choice(_EVENT_TYPES, size=n, p=_EVENT_P),
                               type=pa.string()),
        "value": pa.array(np.round(rs.exponential(50.0, size=n), 2)),
        "props": pa.array([f'{{"k": {int(v)}}}'
                           for v in rs.randint(0, 100, size=n)],
                          type=pa.string()),
    })


def generate_embeddings(n: int, dim: int = 64, seed: int = 13) -> pa.Table:
    rs = np.random.RandomState(seed)
    v = rs.normal(size=(n, dim)).astype(np.float32)
    # ~2% near-duplicates of earlier vectors
    n_dup = n // 50
    dst = rs.choice(np.arange(n // 2, n), size=n_dup, replace=False)
    src = rs.randint(0, n // 2, size=n_dup)
    v[dst] = v[src] + rs.normal(scale=0.05, size=(n_dup, dim)) \
        .astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(v.ravel(), type=pa.float32()), dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array(rs.randint(0, 10, size=n).astype(np.int32)),
    })


def generate_lineitem(n: int, seed: int = 17) -> pa.Table:
    rs = np.random.RandomState(seed)
    base = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    return pa.table({
        "l_orderkey": pa.array(rs.randint(0, max(1, n // 4), size=n)
                               .astype(np.int64)),
        "l_partkey": pa.array(rs.randint(0, max(1, n // 30), size=n)
                              .astype(np.int64)),
        "l_suppkey": pa.array(rs.randint(0, 1000, size=n).astype(np.int64)),
        "l_linenumber": pa.array(rs.randint(1, 8, size=n).astype(np.int32)),
        "l_quantity": pa.array(rs.randint(1, 51, size=n)
                               .astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rs.uniform(1000, 100_000, size=n), 2)),
        "l_discount": pa.array(np.round(rs.uniform(0, 0.1, size=n), 2)),
        "l_tax": pa.array(np.round(rs.uniform(0, 0.08, size=n), 2)),
        "l_returnflag": pa.array(rs.choice(
            np.array(["A", "N", "R"], dtype=object), size=n,
            p=[0.25, 0.5, 0.25]), type=pa.string()),
        "l_linestatus": pa.array(rs.choice(
            np.array(["O", "F"], dtype=object), size=n), type=pa.string()),
        "l_shipdate": pa.array(
            base + rs.randint(0, 7 * 365, size=n).astype(np.int64)
            * 86_400_000_000).cast(pa.timestamp("us")),
    })


def generate_orders(n: int, seed: int = 19) -> pa.Table:
    rs = np.random.RandomState(seed)
    base = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"], dtype=object)
    return pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rs.randint(0, max(1, n // 10), size=n)
                              .astype(np.int64)),
        "o_orderstatus": pa.array(rs.choice(
            np.array(["O", "F", "P"], dtype=object), size=n),
            type=pa.string()),
        "o_totalprice": pa.array(
            np.round(rs.uniform(1000, 400_000, size=n), 2)),
        "o_orderdate": pa.array(
            base + rs.randint(0, 7 * 365, size=n).astype(np.int64)
            * 86_400_000_000).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(rs.choice(prios, size=n),
                                    type=pa.string()),
    })


def generate_part(n: int, seed: int = 23) -> pa.Table:
    rs = np.random.RandomState(seed)
    adjs = np.array(["large", "small", "hot", "cold", "shiny", "plated",
                     "brushed", "polished", "antique", "economy"],
                    dtype=object)
    nouns = np.array(["ring", "bolt", "nut", "washer", "spring", "gear",
                      "axle", "pin", "rod", "plate"], dtype=object)
    names = [f"{a} {b}" for a, b in zip(rs.choice(adjs, size=n),
                                        rs.choice(nouns, size=n))]
    return pa.table({
        "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
        "p_name": pa.array(names, type=pa.string()),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rs.randint(1, 25, size=n)], type=pa.string()),
        "p_type": pa.array(rs.choice(
            np.array(["LARGE", "SMALL", "ECONOMY", "STANDARD", "PROMO"],
                     dtype=object), size=n), type=pa.string()),
        "p_size": pa.array(rs.randint(1, 50, size=n).astype(np.int32)),
        "p_retailprice": pa.array(
            np.round(900.0 + np.arange(n) % 2000 / 10.0, 2)),
    })


# rows per table as a multiple of n_docs (matches the shipped testdata's
# sf0.1 ratios: 5k docs, 100k events, 2k embeddings, 600k lineitem, ...)
_RATIOS = {
    "documents": 1.0,
    "events": 20.0,
    "embeddings": 0.4,
    "lineitem": 120.0,
    "orders": 30.0,
    "part": 4.0,
}

_GENERATORS = {
    "documents": generate_documents,
    "events": generate_events,
    "embeddings": generate_embeddings,
    "lineitem": generate_lineitem,
    "orders": generate_orders,
    "part": generate_part,
}


def write_sf_tables(out_dir: str, n_docs: int,
                    tables=None, row_group_size: int = 100_000) -> str:
    """Write the synthetic table set scaled off ``n_docs`` (sf1 ≈ 50_000).
    Existing files are kept (idempotent resume)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in (tables or _GENERATORS):
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(path):
            continue
        n = int(n_docs * _RATIOS[name])
        pq.write_table(_GENERATORS[name](n), path,
                       row_group_size=row_group_size)
    return out_dir
