"""corpus_prep — the end-to-end training-data prep composition.

One streaming Dataset flow chaining the engine's LLM-pipeline stages the
way a 100-TB webtext job would: per-doc quality features (vectorized
analyzer batch) → exact dedup keep-first (ONE hash groupby; the winning
row's payload rides the same exchange via a packed arg-min key, so no
join-back shuffle) → quality filter → per-language corpus stats.  Two
all-to-all exchanges total: the dedup groupby (keyed by content hash)
and a tiny per-lang groupby over the pre-aggregated survivors.

Oracle: the same chain in ANSI SQL (GROUP BY text + arg_min), see
``SQL_CORPUS_PREP``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..analyzer import ENGLISH_STOP_WORDS, analyze_batch
from ..utils import remote_args
from .sql_common import TOKENS_EXPR, _STOPLIST_SQL

# both thresholds are binding on the synthetic documents table (tokens
# span 10-99, stop_ratio 0-0.22 in every language)
MIN_TOKENS = 25
MAX_STOP_RATIO = 0.12


def q_corpus_prep(sf_dir: str) -> pa.Table:
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    stop = pa.array(sorted(ENGLISH_STOP_WORDS))

    def features(batch: pa.Table) -> pa.Table:
        out = analyze_batch(batch.column("text"), "default")
        flat = out.tokens.values
        is_stop = pc.is_in(flat, value_set=stop).to_numpy(
            zero_copy_only=False)
        n = out.num_tokens
        offs = np.zeros(len(n) + 1, dtype=np.int64)
        np.cumsum(n, out=offs[1:])
        pre = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(is_stop.astype(np.int64), out=pre[1:])
        stops = pre[offs[1:]] - pre[offs[:-1]]
        ratio = np.where(n > 0, stops / np.maximum(n, 1), 0.0)
        ids = batch.column("doc_id").to_numpy()
        langs = batch.column("lang").to_pylist()
        # packed arg-min key: lexicographic min == min doc_id, and the
        # winner's lang rides along (duplicate texts can disagree on
        # lang, so Min("lang") alone would not be keep-first)
        key = pa.array([f"{int(i):012d}\x00{l}" for i, l in zip(ids, langs)],
                       type=pa.string())
        h = pa.array(
            [hashlib.sha256(t.encode()).hexdigest()
             for t in batch.column("text").to_pylist()],
            type=pa.string())
        return pa.table({
            "h": h,
            "key": key,
            "num_tokens": pa.array(n, type=pa.int64()),
            "stop_ratio": pa.array(ratio, type=pa.float64()),
            "n_chars": batch.column("n_chars").cast(pa.int64()),
        })

    feats = ds.map_batches(features, batch_format="pyarrow",
                           **remote_args())

    # exact dedup keep-first: duplicate texts share identical features,
    # so the first row of each (h, key)-sorted run IS the kept doc (the
    # packed key resolves which lang survives).  Sort + run-length
    # replaces the grouped Min aggregate — per-group overhead at
    # one-group-per-doc cardinality (see dedup/exact.py).
    def first_per_hash(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        tbl = tbl.sort_by([("h", "ascending"), ("key", "ascending")])
        h = tbl.column("h").combine_chunks()
        neq = pc.invert(pc.equal(h.slice(1), h.slice(0, len(h) - 1)))
        if isinstance(neq, pa.ChunkedArray):
            neq = neq.combine_chunks()
        mask = pa.concat_arrays([pa.array([True]), neq])
        return tbl.filter(mask)

    kept = feats.sort("h").map_batches(
        first_per_hash, batch_size=None, batch_format="pyarrow",
        **remote_args())

    def keep_quality(batch: pa.Table) -> pa.Table:
        nt = batch.column("num_tokens").to_numpy()
        sr = batch.column("stop_ratio").to_numpy()
        mask = (nt >= MIN_TOKENS) & (sr <= MAX_STOP_RATIO)
        sel = batch.filter(pa.array(mask))
        langs = pc.utf8_slice_codeunits(sel.column("key"), 13)
        return pa.table({
            "lang": langs.combine_chunks()
            if isinstance(langs, pa.ChunkedArray) else langs,
            "num_tokens": sel.column("num_tokens"),
            "n_chars": sel.column("n_chars"),
        })

    filt = kept.map_batches(keep_quality, batch_format="pyarrow",
                            **remote_args())
    agg = (filt.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("num_tokens", alias_name="total_tokens"),
        Sum("n_chars", alias_name="total_chars"),
    ).sort("lang"))
    pdf = agg.to_pandas()
    schema = pa.schema([("lang", pa.string()), ("n_docs", pa.int64()),
                        ("total_tokens", pa.int64()),
                        ("total_chars", pa.int64())])
    if len(pdf) == 0:  # nothing survived the filter: keep the schema
        return pa.Table.from_pydict(
            {f.name: [] for f in schema}, schema=schema)
    for c in ("n_docs", "total_tokens", "total_chars"):
        pdf[c] = pdf[c].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False).cast(schema)


SQL_CORPUS_PREP = f"""
WITH feat AS (
  SELECT doc_id, lang, text, n_chars, {TOKENS_EXPR} AS ts FROM documents
), scored AS (
  SELECT doc_id, lang, text, n_chars, len(ts) AS num_tokens,
         CASE WHEN len(ts) > 0 THEN
           len(list_filter(ts, x -> x IN ({_STOPLIST_SQL}))) * 1.0 / len(ts)
         ELSE 0.0 END AS stop_ratio
  FROM feat
), kept AS (
  SELECT arg_min(lang, doc_id) AS lang,
         min(num_tokens) AS num_tokens,
         min(stop_ratio) AS stop_ratio,
         min(n_chars) AS n_chars
  FROM scored GROUP BY text
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(num_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM kept
WHERE num_tokens >= {MIN_TOKENS} AND stop_ratio <= {MAX_STOP_RATIO}
GROUP BY lang ORDER BY lang
"""
