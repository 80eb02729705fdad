"""Deterministic synthetic Common-Crawl-style `pages` table.

Exactly the BASELINE.json input_hint shape:
    (url:string, warc_ts:timestamp[s], html:binary, text:string, lang:string)

FIXTURES.md requirements baked in:
- seeded Zipfian vocabulary (head-term skew for the salted merge);
- document lengths spanning many fieldnorm buckets;
- rows with >=40-byte tokens (RemoveLongFilter drop path);
- the reference's own unit-vector strings ("Hello, happy tax payer!",
  "Русский текст") and punctuation/Unicode edge rows at fixed indices;
- at scale >~300 rows, head terms span >128 docs (full bitpacked block +
  tail + skip entries).

Everything derives from numpy RandomState(seed) — same n + seed ⇒
byte-identical table on any machine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB_CORE = [
    "the", "of", "and", "to", "in", "a", "is", "for", "on", "with",
    "search", "index", "query", "term", "document", "page", "web", "crawl",
    "data", "engine", "rank", "score", "match", "token", "text", "link",
    "site", "html", "content", "archive", "fast", "slow", "big", "small",
    "merge", "segment", "posting", "block", "batch", "stream", "shard",
    "table", "row", "column", "value", "hash", "sort", "scan", "filter",
]

SPECIAL_ROWS = {
    0: "Hello, happy tax payer!",
    1: "Русский текст",
    2: "",
    3: "x" * 50 + " short alpha beta " + "y" * 39,
    4: "ΟΔΟΣ και οδός punctuation... mixed_CASE TokensHere",
}

BASE_TS = 1_700_000_000  # fixed epoch seconds


def _vocab(n_extra: int = 452) -> list:
    """Core head terms + generated tail words (total 500)."""
    tail = [f"w{i:04d}" for i in range(n_extra)]
    return VOCAB_CORE + tail


def generate_pages_table(n: int, seed: int = 42) -> pa.Table:
    rs = np.random.RandomState(seed)
    vocab = np.array(_vocab(), dtype=object)
    v = len(vocab)
    # Zipfian rank probabilities over the vocab
    probs = 1.0 / np.arange(1, v + 1) ** 1.1
    probs /= probs.sum()

    lens = rs.randint(5, 120, size=n)
    total = int(lens.sum())
    words = rs.choice(vocab, size=total, p=probs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n)]
    for i, special in SPECIAL_ROWS.items():
        if i < n:
            texts[i] = special

    langs = rs.choice(np.array(["en", "de", "fr", "es", "ru"], dtype=object),
                      size=n, p=[0.7, 0.1, 0.08, 0.07, 0.05])
    urls = [f"https://example.org/p/{i:09d}" for i in range(n)]
    html = [f"<html><body>{t[:64]}</body></html>".encode() for t in texts]
    ts = (BASE_TS + rs.randint(0, 10_000_000, size=n)).astype("int64")

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("s")),
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def write_pages_parquet(path: str, n: int, seed: int = 42,
                        row_group_size: int = 50_000) -> str:
    import pyarrow.parquet as pq

    pq.write_table(generate_pages_table(n, seed), path,
                   row_group_size=row_group_size)
    return path


REFERENCE_QUERY_SET = [
    # (query_id, terms, mode, k) — FIXTURES.md §2 mix: single-term,
    # multi-OR, AND, absent term, tie-heavy head term
    (0, ["search"], "or", 10),
    (1, ["index", "engine"], "or", 10),
    (2, ["query", "term", "document"], "or", 20),
    (3, ["web", "crawl"], "and", 10),
    (4, ["the", "data"], "and", 15),
    (5, ["nonexistenttermxyz"], "or", 10),
    (6, ["search", "nonexistenttermxyz"], "or", 10),
    (7, ["the"], "or", 25),          # head term, many score ties
    (8, ["posting", "block", "batch"], "or", 10),
    (9, ["rank", "score"], "and", 10),
]
