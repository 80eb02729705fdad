"""Phrase search, sessionization, snippets, MoreLikeThis — contract entries.

- phrase_topk: positions-backed PhraseQuery parity with a SQL oracle that
  reproduces the phrase-match tf (adjacency self-join over token ordinals)
  and the f32 phrase BM25 weight (Σ idf · 2.2 — reference bm25.rs:120-127).
- sessionize_events: the streaming-shaped op per the Ray guide — events as
  an ordered, partitioned log; session windows (30-min gap) computed per
  user inside ``groupby(user).map_groups`` over the ts-sorted group; the
  SQL oracle uses lag() window functions.
- snippets / more_like_this: rows-only (HTML snippets and MLT boosts are
  not SQL-expressible).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..utils import remote_args
from .sql_common import (
    FNTAB_SQL,
    TOK_CTE,
    TOKENS_EXPR,
    build_docs_index,
    golden_sql as _golden_sql,
    _index_cache_dir,
)

PHRASE_QUERIES = [
    (0, ["table", "scan"], 10),
    (1, ["group", "order"], 10),
    (2, ["spark", "join", "stream"], 10),
    (3, ["nosuch", "phrase"], 5),
]

SESSION_GAP_S = 1800


def _positions_index(sf_dir: str) -> str:
    from ..index.build import build_index

    idx = _index_cache_dir(sf_dir) + "_pos"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(
            os.path.join(sf_dir, "documents.parquet"), idx,
            text_col="text", id_col="doc_id", docs_per_segment=2000,
            record_positions=True,
        )
    return idx


def q_phrase_topk(sf_dir: str) -> pa.Table:
    from ..search import IndexSearcher

    s = IndexSearcher(_positions_index(sf_dir))
    hits_flat = []
    for qid, terms, k in PHRASE_QUERIES:
        for rank, (score, seg, doc) in enumerate(s.search_phrase(terms, k)):
            hits_flat.append((qid, rank, seg, doc))
    keys = s.resolve_doc_keys([(h[2], h[3]) for h in hits_flat])
    rows = [(h[0], h[1], int(kk)) for h, kk in zip(hits_flat, keys)]
    pdf = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id"]).astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def _sql_phrase_topk() -> str:
    per_q = []
    for qid, terms, k in PHRASE_QUERIES:
        conds = " AND ".join(
            f"t{i}.term = '{t}'" for i, t in enumerate(terms)
        )
        joins = " ".join(
            f"JOIN tokp t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
            for i in range(1, len(terms))
        )
        idf_sum = " + ".join(
            f"ln(1.0 + (s.n_docs - (SELECT count(DISTINCT doc_id) FROM tok "
            f"WHERE term = '{t}') + 0.5) / ((SELECT count(DISTINCT doc_id) "
            f"FROM tok WHERE term = '{t}') + 0.5))"
            for t in terms
        )
        per_q.append(f"""
SELECT {qid} AS query_id, x.doc_id,
       CAST(({idf_sum}) * 2.2 * x.tf
            / (x.tf + 1.2 * (0.25 + 0.75 * fnorm.fn
               / (s.n_tokens * 1.0 / s.n_docs))) AS FLOAT4) AS score,
       {k} AS k
FROM (SELECT t0.doc_id, count(*) AS tf FROM tokp t0 {joins}
      WHERE {conds} GROUP BY t0.doc_id) x
JOIN fnorm ON fnorm.doc_id = x.doc_id CROSS JOIN stats s""")
    union = " UNION ALL ".join(per_q)
    return f"""
WITH {TOK_CTE},
{FNTAB_SQL},
tokp AS (SELECT doc_id, unnest({TOKENS_EXPR}) AS term,
                generate_subscripts({TOKENS_EXPR}, 1) - 1 AS pos
         FROM documents),
doclen AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok) AS n_tokens),
fnorm AS (SELECT d.doc_id,
          (SELECT max(v) FROM fntab WHERE v <= d.n) AS fn FROM doclen d),
scored AS ({union}),
ranked AS (SELECT query_id, doc_id, k,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) - 1 AS rank
           FROM scored)
SELECT query_id, rank, doc_id FROM ranked WHERE rank < k
"""


_SESS_COLS = ("user_id", "n_events", "n_sessions", "longest_session_events")


def _sessions_kernel(uid: np.ndarray, ts: np.ndarray) -> pa.Table:
    """Per-user session aggregates over (user, ts)-lexsorted arrays of
    user ids and epoch seconds, fully vectorized (a per-user map_groups
    would pay pandas slicing per user at corpus scale)."""
    n = len(uid)
    if n == 0:
        return pa.table({k: pa.array([], type=pa.int64())
                         for k in _SESS_COLS})
    user_change = np.empty(n, dtype=bool)
    user_change[0] = True
    user_change[1:] = uid[1:] != uid[:-1]
    sess_start = user_change.copy()
    sess_start[1:] |= (ts[1:] - ts[:-1]) > SESSION_GAP_S
    ustarts = np.flatnonzero(user_change)
    uends = np.append(ustarts[1:], n)
    n_events = uends - ustarts
    n_sessions = np.add.reduceat(sess_start.astype(np.int64), ustarts)
    sstarts = np.flatnonzero(sess_start)
    slens = np.diff(np.append(sstarts, n))
    # sessions are contiguous per user; reduce session lengths at
    # each user's first session
    su_starts = np.flatnonzero(user_change[sstarts])
    longest = np.maximum.reduceat(slens, su_starts)
    return pa.table({
        "user_id": pa.array(uid[ustarts], type=pa.int64()),
        "n_events": pa.array(n_events, type=pa.int64()),
        "n_sessions": pa.array(n_sessions, type=pa.int64()),
        "longest_session_events": pa.array(longest, type=pa.int64()),
    })


def q_sessionize_events(sf_dir: str) -> pa.Table:
    """sort('user_id') co-locates each user's rows, then each block runs
    the vectorized kernel over its INTERIOR users only.  Ray's range
    partitioner samples boundaries and may split one user's rows across
    two blocks, so the first and last user of every block are emitted as
    raw (user_id, ts) rows instead and re-aggregated exactly through a
    groupby().map_groups pass — at most 2 users per block, so the
    per-group overhead is negligible while block-straddling users (and
    whale users spanning many blocks) stay correct."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def split_block(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return pa.table({
                "kind": pa.array([], type=pa.int8()),
                "ts_s": pa.array([], type=pa.int64()),
                **{k: pa.array([], type=pa.int64()) for k in _SESS_COLS}})
        uid = tbl.column("user_id").to_numpy().astype(np.int64)
        ts = (tbl.column("ts").cast(pa.timestamp("us")).to_numpy()
              .astype("datetime64[us]").astype(np.int64) // 1_000_000)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        edge = (uid == uid[0]) | (uid == uid[-1])
        fin = _sessions_kernel(uid[~edge], ts[~edge])
        nf, nb = fin.num_rows, int(edge.sum())
        return pa.table({
            "kind": pa.array([0] * nf + [1] * nb, type=pa.int8()),
            "ts_s": pa.array([0] * nf + list(ts[edge]), type=pa.int64()),
            "user_id": pa.concat_arrays(
                [fin.column("user_id").combine_chunks(),
                 pa.array(uid[edge], type=pa.int64())]),
            **{k: pa.array(fin.column(k).to_pylist() + [0] * nb,
                           type=pa.int64())
               for k in _SESS_COLS[1:]},
        })

    marked = (ds.sort("user_id")
              .map_batches(split_block, batch_size=None,
                           batch_format="pyarrow", **remote_args())
              .materialize())

    def take_finals(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return tbl.filter(pc.equal(tbl.column("kind"), 0)) \
                  .select(list(_SESS_COLS))

    finals = marked.map_batches(take_finals, batch_format="pyarrow",
                                **remote_args())

    def one_user(tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").to_numpy().astype(np.int64)
        ts = tbl.column("ts_s").to_numpy().astype(np.int64)
        order = np.lexsort((ts, uid))
        return _sessions_kernel(uid[order], ts[order])

    def take_boundary(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return tbl.filter(pc.equal(tbl.column("kind"), 1)) \
                  .select(["user_id", "ts_s"])

    boundary = (marked.map_batches(take_boundary, batch_format="pyarrow",
                                   **remote_args())
                .groupby("user_id")
                .map_groups(one_user, batch_format="pyarrow",
                            **remote_args()))

    out = (finals.union(boundary)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)


SQL_SESSIONIZE_EVENTS = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessioned AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n FROM sessioned
  GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       count(*) AS n_sessions,
       max(n) AS longest_session_events
FROM per_session GROUP BY user_id
"""


SNIPPET_TERMS = ["table", "scan"]


def q_snippets(sf_dir: str) -> pa.Table:
    """Best-fragment snippets for AND('table','scan') hits, oracle-paired
    (VERDICT round-3 item 5): (rank, doc_id) is independently recomputed
    by the FLOAT4 BM25 SQL oracle, and two boolean gates assert snippet
    invariants per hit — the fragment (tags stripped) is a verbatim
    substring of the doc text, and at least one query term is inside a
    <b> highlight (reference snippet semantics, src/snippet/mod.rs)."""
    import html
    import re as _re

    import ray.data as rd

    from ..search import IndexSearcher
    from ..search.snippet import SnippetGenerator

    s = IndexSearcher(build_docs_index(sf_dir))
    hits = s.search(SNIPPET_TERMS, "and", 10)
    gen = SnippetGenerator.from_terms(SNIPPET_TERMS, s, max_num_chars=80)
    keys = s.resolve_doc_keys([(seg, doc) for _, seg, doc in hits])
    wanted = {int(kk): rank for rank, kk in enumerate(keys)}

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = []
        for d, t in zip(ids, texts):
            if int(d) not in wanted:
                continue
            snip = gen.snippet(t).to_html()
            frag = html.unescape(_re.sub(r"</?b>", "", snip))
            highlighted = _re.findall(r"<b>(.*?)</b>", snip)
            rows.append((
                wanted[int(d)], int(d),
                frag in t,
                any(html.unescape(h).lower() in SNIPPET_TERMS
                    for h in highlighted),
            ))
        rows.sort()
        return pa.table({
            "rank": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "frag_in_text": pa.array([r[2] for r in rows], type=pa.bool_()),
            "has_highlight": pa.array([r[3] for r in rows], type=pa.bool_()),
        })

    out = ds.map_batches(make, batch_format="pyarrow", **remote_args())
    pdf = out.to_pandas().sort_values("rank").reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False)


def _sql_snippets() -> str:
    from .sql_common import _sql_topk_bm25

    inner = _sql_topk_bm25([(0, SNIPPET_TERMS, "and", 10)])
    return (f"SELECT rank, doc_id, TRUE AS frag_in_text, "
            f"TRUE AS has_highlight FROM ({inner}) ORDER BY rank")


def q_more_like_this(sf_dir: str) -> pa.Table:
    """Top-10 similar docs to doc 0's text, oracle-paired (VERDICT
    round-3 item 5): the SQL oracle replays the full MLT pipeline —
    candidate terms from doc 0's tf, df >= min_doc_frequency filter,
    tf x FLOAT4(idf) scoring, top-12 by (score desc, term asc), Lucene
    normalized boosts score/best, then the FLOAT4-cast BM25 sum — so
    (rank, doc_id) is an independent recomputation, boosted-query path
    included (reference src/query/more_like_this/more_like_this.rs:28)."""
    import pyarrow.parquet as pq

    from ..search import IndexSearcher
    from ..search.more_like_this import MoreLikeThis

    s = IndexSearcher(build_docs_index(sf_dir))
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "==", 0)])
    text0 = t.column("text")[0].as_py()
    mlt = MoreLikeThis(min_doc_frequency=2, max_query_terms=12)
    hits = mlt.search(text0, s, k=10)
    keys = s.resolve_doc_keys([(seg, doc) for _, seg, doc in hits])
    return pa.table({
        "rank": pa.array(range(len(hits)), type=pa.int64()),
        "doc_id": pa.array([int(k) for k in keys], type=pa.int64()),
    })


def _sql_more_like_this() -> str:
    from .sql_common import FNTAB_SQL, TOK_CTE

    return f"""
WITH {TOK_CTE},
{FNTAB_SQL},
doclen AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok) AS n_tokens),
fnorm AS (SELECT d.doc_id,
          (SELECT max(v) FROM fntab WHERE v <= d.n) AS fn FROM doclen d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
doc0 AS (SELECT term, count(*) AS tf0 FROM tok WHERE doc_id = 0
         GROUP BY term),
-- MLT term selection: score = tf_in_doc0 * FLOAT4(idf); df >= 2;
-- top max_query_terms=12 by (score desc, term asc)
cand AS (
  SELECT d0.term,
         d0.tf0 * CAST(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                       AS FLOAT4) AS tscore
  FROM doc0 d0 JOIN df ON df.term = d0.term CROSS JOIN stats s
  WHERE df.df >= 2
  ORDER BY tscore DESC, d0.term ASC LIMIT 12),
best AS (SELECT max(tscore) AS b FROM cand),
-- boosted BM25 sum, FLOAT4-quantized like the engine's f32 kernel
scored AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(
             CAST(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                  AS FLOAT4) * 2.2 * (c.tscore / best.b)
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * fnorm.fn
                        / (s.n_tokens * 1.0 / s.n_docs))) AS FLOAT4))
           AS FLOAT4) AS score
  FROM cand c
  JOIN tf ON tf.term = c.term
  JOIN df ON df.term = c.term
  JOIN fnorm ON fnorm.doc_id = tf.doc_id
  CROSS JOIN stats s CROSS JOIN best
  GROUP BY tf.doc_id)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank,
       doc_id
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def _ff_index(sf_dir: str) -> str:
    from ..index.build import build_index

    idx = _index_cache_dir(sf_dir) + "_ff"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(
            os.path.join(sf_dir, "documents.parquet"), idx,
            text_col="text", id_col="doc_id", docs_per_segment=2000,
            fast_fields=["lang", "n_chars", "source"],
        )
    return idx


def q_topk_bm25_filtered(sf_dir: str) -> pa.Table:
    """FilterCollector analog: BM25 top-10 for OR('table','scan') among
    docs with lang='en' (fast-field equality filter)."""
    from ..search import IndexSearcher
    from ..search.query import (
        BooleanQuery, FastFieldFilterQuery, TermQuery,
    )

    s = IndexSearcher(_ff_index(sf_dir))
    q = FastFieldFilterQuery(
        BooleanQuery(should=[TermQuery("table"), TermQuery("scan")]),
        field="lang", equals="en",
    )
    hits = s.search_query(q, 10)
    keys = s.resolve_doc_keys([(seg, doc) for _, seg, doc in hits])
    return pa.table({
        "rank": pa.array(range(len(hits)), type=pa.int64()),
        "doc_id": pa.array([int(k) for k in keys], type=pa.int64()),
    })


SQL_TOPK_BM25_FILTERED = f"""
WITH {TOK_CTE},
{FNTAB_SQL},
doclen AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok) AS n_tokens),
fnorm AS (SELECT d.doc_id,
          (SELECT max(v) FROM fntab WHERE v <= d.n) AS fn FROM doclen d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(term) AS (VALUES ('table'), ('scan')),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(
             ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * 2.2
             * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * fnorm.fn
                        / (s.n_tokens * 1.0 / s.n_docs))) AS FLOAT4))
           AS FLOAT4) AS score
  FROM q JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN fnorm ON fnorm.doc_id = tf.doc_id
  JOIN documents d2 ON d2.doc_id = tf.doc_id AND d2.lang = 'en'
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS rank,
       doc_id
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_count_matching(sf_dir: str) -> pa.Table:
    """Count collector: Σ per-segment match counts per query."""
    from ..search import IndexSearcher
    from ..search.query import BooleanQuery, TermQuery, count_query
    from .sql_common import DOC_QUERIES

    s = IndexSearcher(build_docs_index(sf_dir))
    rows = []
    for qid, terms, mode, _ in DOC_QUERIES:
        tq = [TermQuery(t) for t in terms]
        q = BooleanQuery(must=tq) if mode == "and" else BooleanQuery(should=tq)
        n = count_query(s.readers, q, s.total_num_docs,
                        s.average_fieldnorm, s.doc_freq)
        rows.append((qid, n))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_matching": pa.array([r[1] for r in rows], type=pa.int64()),
    })


def _sql_count_matching() -> str:
    from .sql_common import DOC_QUERIES

    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _, _ in DOC_QUERIES for t in terms
    )
    qmeta = ", ".join(
        f"({qid}, {len(terms)}, '{mode}')" for qid, terms, mode, _ in DOC_QUERIES
    )
    return f"""
WITH {TOK_CTE},
dterm AS (SELECT DISTINCT doc_id, term FROM tok),
q(query_id, term) AS (VALUES {qvals}),
qmeta(query_id, n_terms, mode) AS (VALUES {qmeta}),
matched AS (
  SELECT q.query_id, dterm.doc_id, count(*) AS hits
  FROM q JOIN dterm ON dterm.term = q.term
  GROUP BY q.query_id, dterm.doc_id
)
SELECT m.query_id, count(x.doc_id) AS n_matching
FROM qmeta m LEFT JOIN matched x
  ON x.query_id = m.query_id
  AND (m.mode = 'or' OR x.hits = m.n_terms)
GROUP BY m.query_id
"""


def q_top_by_nchars(sf_dir: str) -> pa.Table:
    """TopDocs-by-fast-field: docs containing 'merge', ordered n_chars
    desc, DocAddress-ascending ties."""
    from ..search import IndexSearcher
    from ..search.query import TermQuery, topk_by_fast_field

    s = IndexSearcher(_ff_index(sf_dir))
    hits = topk_by_fast_field(
        s.readers, TermQuery("merge"), "n_chars", 10, True,
        s.total_num_docs, s.average_fieldnorm, s.doc_freq,
    )
    keys = s.resolve_doc_keys([(seg, doc) for _, seg, doc in hits])
    return pa.table({
        "rank": pa.array(range(len(hits)), type=pa.int64()),
        "doc_id": pa.array([int(k) for k in keys], type=pa.int64()),
        "n_chars": pa.array([int(v) for v, _, _ in hits], type=pa.int64()),
    })


SQL_TOP_BY_NCHARS = f"""
WITH {TOK_CTE}
SELECT ROW_NUMBER() OVER (ORDER BY d.n_chars DESC, d.doc_id ASC) - 1 AS rank,
       d.doc_id, d.n_chars
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tok WHERE term = 'merge')
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10
"""



def _json_index(sf_dir: str) -> str:
    """Shared flattened-JSON index over events.props (text + typed
    terms), built once per sf_dir."""
    import hashlib as _hashlib

    from ..pipelines.json_fields import build_json_index

    tag = _hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp/tantivy_ray_cache", f"json_ix2_{tag}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_json_index(sf_dir, idx)
    return idx


def q_json_numeric_range(sf_dir: str) -> pa.Table:
    """Typed JSON path terms (VERDICT r3 item 9; reference
    segment_writer.rs:381-400): numbers under props.k are indexed as
    order-preserving typed terms, so numeric RANGE queries work inside
    JSON — counts of events with props.k in fixed ranges, served from
    the same flattened index as json_term_df."""
    from ..pipelines.json_fields import json_numeric_range_query
    from ..search import IndexSearcher
    from ..search.query import count_query

    s = IndexSearcher(_json_index(sf_dir))
    ranges = [(0, 10, False), (10, 50, False), (50, 99, True)]
    rows = []
    for lo, hi, iu in ranges:
        q = json_numeric_range_query("props.k", lo, hi, include_upper=iu)
        n = count_query(s.readers, q, s.total_num_docs,
                        s.average_fieldnorm, s.doc_freq)
        rows.append((f"{lo}-{hi}{'incl' if iu else ''}", n))
    return pa.table({
        "bucket": pa.array([r[0] for r in rows], type=pa.string()),
        "doc_count": pa.array([r[1] for r in rows], type=pa.int64()),
    })


SQL_JSON_NUMERIC_RANGE = """
SELECT b.bucket, count(k.v) AS doc_count
FROM (VALUES ('0-10', 0, 10, FALSE), ('10-50', 10, 50, FALSE),
             ('50-99incl', 50, 99, TRUE)) AS b(bucket, lo, hi, iu)
LEFT JOIN (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS v
           FROM events) k
  ON k.v >= b.lo AND (k.v < b.hi OR (b.iu AND k.v = b.hi))
GROUP BY b.bucket
ORDER BY b.bucket
"""


def q_json_term_df(sf_dir: str) -> pa.Table:
    """JSON dynamic fields: doc_freq of each flattened props.k=<v> term
    (the JsonObject path-term analog) served from a whitespace-analyzed
    term index over events.props."""
    from ..search import IndexSearcher

    idx = _json_index(sf_dir)
    s = IndexSearcher(idx)
    # vectorized vocab stats: per-segment Arrow (term, doc_freq) tables
    # summed with one groupby — no per-term python lookups; TYPED value
    # terms (path\x01<type><enc>, the range surface) are excluded: this
    # query is the doc_freq of the flattened TEXT terms
    import pyarrow.compute as pc

    merged = pa.concat_tables([r.term_stats_table() for r in s.readers])
    grouped = merged.group_by("term").aggregate([("doc_freq", "sum")])
    keep = pc.invert(pc.match_substring(
        grouped.column("term").cast(pa.string()), "\x01"))
    grouped = grouped.filter(keep).sort_by("term")
    return pa.table({
        "term": grouped.column("term").cast(pa.string()),
        "doc_freq": grouped.column("doc_freq_sum").cast(pa.int64()),
    })


SQL_JSON_TERM_DF = """
SELECT 'props.k=' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
         AS term,
       count(*) AS doc_freq
FROM events GROUP BY 1
"""


def q_field_scoped_counts(sf_dir: str) -> pa.Table:
    """Multi-field schema through the contract: docs per source via
    field-scoped TermQuery over a multi-field index (source/lang indexed
    as raw extra fields alongside text)."""
    import hashlib as _hashlib

    from ..index.build import build_index
    from ..search import IndexSearcher
    from ..search.query import TermQuery, count_query

    tag = _hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp/tantivy_ray_cache", f"mf_ix_{tag}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(
            os.path.join(sf_dir, "documents.parquet"), idx,
            text_col="text", id_col="doc_id", docs_per_segment=2000,
            extra_text_fields={"source": "raw", "lang": "raw"},
        )
    s = IndexSearcher(idx)
    # prefix-range bisect over the sorted dict (O(log V) probes per
    # segment) instead of scanning the full vocabulary
    sources = sorted({
        t.as_py().split("\x00", 1)[1]
        for r in s.readers
        for t in r.term_array()[slice(*r.term_prefix_range("source\x00"))]
    })
    rows = [(src, count_query(s.readers, TermQuery(src, field="source"),
                              s.total_num_docs, s.average_fieldnorm,
                              s.doc_freq))
            for src in sources]
    return pa.table({
        "source": pa.array([r[0] for r in rows], type=pa.string()),
        "doc_count": pa.array([r[1] for r in rows], type=pa.int64()),
    })


SQL_FIELD_SCOPED_COUNTS = (
    "SELECT source, count(*) AS doc_count FROM documents GROUP BY source"
)


class _NumericIndexPrep:
    """Per-partition build transform: encode the numeric column as
    order-preserving terms + add an empty primary text column."""

    def __init__(self, col: str, kind: str = "f64"):
        self.col = col
        self.kind = kind

    def __call__(self, table: pa.Table) -> pa.Table:
        from ..index.numeric import EncodeNumericStage

        t = EncodeNumericStage(self.col, kind=self.kind)(table)
        return t.append_column(
            "dummy_text", pa.array([""] * len(t), type=pa.string()))


def q_numeric_range_count(sf_dir: str) -> pa.Table:
    """RangeQuery over numeric values, exercised through BOTH reference
    variants (reference range_query/ picks per field capability): the
    inverted-index term-range union over order-preserving encoded terms
    AND the fast-field columnar scan (range_query_fastfield.rs) over the
    raw value column stored as a fast field — the counts are asserted
    identical before returning, so the oracle hash covers both paths."""
    import hashlib as _hashlib

    from ..index.build import build_index
    from ..search import IndexSearcher
    from ..search.query import NumericRangeQuery, count_query

    tag = _hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp/tantivy_ray_cache", f"num_ix2_{tag}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        # distributed: the numeric term-encode runs as the build task's
        # per-partition transform straight off events.parquet — no
        # driver-side materialization or re-write of the dataset
        build_index(
            os.path.join(sf_dir, "events.parquet"), idx,
            text_col="dummy_text", id_col="event_id",
            docs_per_segment=50_000,
            extra_text_fields={"value_enc": "raw"},
            fast_fields=["value"],
            transform=_NumericIndexPrep("value", kind="f64"),
            source_columns=["event_id", "value"],
        )
    s = IndexSearcher(idx)
    ranges = [(0.0, 5.0), (5.0, 20.0), (20.0, 100.0)]
    rows = []
    for lo, hi in ranges:
        variant_counts = []
        for force in ("terms", "scan"):
            q = NumericRangeQuery("value_enc", lo, hi, kind="f64",
                                  fast_field="value")
            q.force_variant = force
            variant_counts.append(
                count_query(s.readers, q, s.total_num_docs,
                            s.average_fieldnorm, s.doc_freq))
        assert variant_counts[0] == variant_counts[1], (
            f"range variants disagree on [{lo},{hi}): {variant_counts}")
        rows.append((f"{lo}-{hi}", variant_counts[0]))
    return pa.table({
        "bucket": pa.array([r[0] for r in rows], type=pa.string()),
        "doc_count": pa.array([r[1] for r in rows], type=pa.int64()),
    })


SQL_NUMERIC_RANGE_COUNT = """
SELECT b.bucket, count(e.value) AS doc_count
FROM (VALUES ('0.0-5.0', 0.0, 5.0), ('5.0-20.0', 5.0, 20.0),
             ('20.0-100.0', 20.0, 100.0)) AS b(bucket, lo, hi)
LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bucket
"""


def q_fuzzy_match_count(sf_dir: str) -> pa.Table:
    """FuzzyTermQuery at the gate: docs matching 'tabel'~1 / 'window'~1
    (transposition=False to mirror SQL levenshtein())."""
    from ..search import IndexSearcher
    from ..search.query import FuzzyTermQuery, count_query

    s = IndexSearcher(build_docs_index(sf_dir))
    rows = []
    for probe in ("tabel", "window", "qqqq"):
        q = FuzzyTermQuery(probe, distance=1, transposition=False)
        rows.append((probe, count_query(
            s.readers, q, s.total_num_docs, s.average_fieldnorm, s.doc_freq)))
    return pa.table({
        "probe": pa.array([r[0] for r in rows], type=pa.string()),
        "n_matching": pa.array([r[1] for r in rows], type=pa.int64()),
    })


SQL_FUZZY_MATCH_COUNT = f"""
WITH {TOK_CTE},
probes(probe) AS (VALUES ('tabel'), ('window'), ('qqqq'))
SELECT p.probe, count(DISTINCT t.doc_id) AS n_matching
FROM probes p LEFT JOIN tok t ON levenshtein(t.term, p.probe) <= 1
GROUP BY p.probe
"""


def q_regex_match_count(sf_dir: str) -> pa.Table:
    """RegexQuery at the gate: docs containing a term matching each regex."""
    from ..search import IndexSearcher
    from ..search.query import RegexQuery, count_query

    s = IndexSearcher(build_docs_index(sf_dir))
    rows = []
    for pat in ("s.an", "w.+dow", "zzz+"):
        q = RegexQuery(pat)
        rows.append((pat, count_query(
            s.readers, q, s.total_num_docs, s.average_fieldnorm, s.doc_freq)))
    return pa.table({
        "pattern": pa.array([r[0] for r in rows], type=pa.string()),
        "n_matching": pa.array([r[1] for r in rows], type=pa.int64()),
    })


SQL_REGEX_MATCH_COUNT = f"""
WITH {TOK_CTE},
pats(pattern) AS (VALUES ('s.an'), ('w.+dow'), ('zzz+'))
SELECT p.pattern, count(DISTINCT t.doc_id) AS n_matching
FROM pats p LEFT JOIN tok t ON regexp_full_match(t.term, p.pattern)
GROUP BY p.pattern
"""


def q_stemmed_doc_freqs(sf_dir: str) -> pa.Table:
    """Rows-only: doc_freq per en_stem term (Snowball English not
    SQL-expressible; output deterministic)."""
    import hashlib as _hashlib

    from ..index.build import build_index
    from ..search import IndexSearcher

    tag = _hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp/tantivy_ray_cache", f"stem_ix_{tag}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_index(os.path.join(sf_dir, "documents.parquet"), idx,
                    text_col="text", id_col="doc_id", analyzer="en_stem",
                    docs_per_segment=50_000)
    s = IndexSearcher(idx)
    merged = pa.concat_tables([r.term_stats_table() for r in s.readers])
    grouped = merged.group_by("term").aggregate([("doc_freq", "sum")])
    grouped = grouped.sort_by("term")
    return pa.table({
        "term": grouped.column("term").cast(pa.string()),
        "doc_freq": grouped.column("doc_freq_sum").cast(pa.int64()),
    })


def q_stemmed_doc_freqs_multilang(sf_dir: str) -> pa.Table:
    """Rows-only: per (lang, term) doc_freq with LANG-ROUTED analyzers —
    each document is stemmed by its own language's chain (18 language
    routes registered: en Porter2 + 17 in snowball_langs.py, matching
    the reference's full Stemmer roster, src/tokenizer/stemmer.rs:63-120;
    languages outside the roster fall back to `default`).  The synthetic
    corpus carries en/de/es/fr/zh — golden vectors in
    tests/test_snowball_langs.py exercise every registered language.
    Deterministic, not SQL-expressible (no stemmer in this DuckDB)."""
    import ray.data as rd

    from ..analyzer import analyze_batch, analyzer_for_lang

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        # per-lang routing with Arrow masks; (doc, term) dedup + df via
        # dictionary-encode + one np.unique per language — no pandas
        # round-trip, no Python row selection
        import numpy as _np
        import pyarrow.compute as _pc

        lang_col = batch.column("lang")
        rows_lang, rows_term, rows_df = [], [], []
        for lang_v in _pc.unique(lang_col.combine_chunks()).to_pylist():
            sub = batch.filter(_pc.equal(lang_col, lang_v))
            out = analyze_batch(sub.column("text"),
                                analyzer_for_lang(lang_v))
            flat = out.tokens.values
            if len(flat) == 0:
                continue
            enc = _pc.dictionary_encode(flat.combine_chunks()
                                        if hasattr(flat, "combine_chunks")
                                        else flat)
            codes = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(_np.int64)
            n_terms = len(enc.dictionary)
            docs = _np.repeat(_np.arange(len(sub), dtype=_np.int64),
                              out.num_tokens)
            pair_keys = docs * n_terms + codes
            uniq_pairs = _np.unique(pair_keys)
            df = _np.bincount((uniq_pairs % n_terms).astype(_np.int64),
                              minlength=n_terms)
            terms = enc.dictionary.to_pylist()
            rows_lang.extend([lang_v] * n_terms)
            rows_term.extend(terms)
            rows_df.extend(int(v) for v in df)
        return pa.table({
            "lang": pa.array(rows_lang, type=pa.string()),
            "term": pa.array(rows_term, type=pa.string()),
            "df_part": pa.array(rows_df, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow", **remote_args())
           .groupby(["lang", "term"])
           .aggregate(Sum("df_part", alias_name="doc_freq")))
    pdf = agg.to_pandas().sort_values(["lang", "term"]).reset_index(drop=True)
    pdf["doc_freq"] = pdf["doc_freq"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


def pc_cast_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64())  # timestamp[us] -> int64 microseconds


def q_asof_join_events(sf_dir: str) -> pa.Table:
    """AS-OF join (functions/joins.py): each 'click' event joined to the
    user's latest prior-or-simultaneous 'view' event's value; DuckDB's
    native ASOF LEFT JOIN is the oracle."""
    import ray.data as rd

    from ..functions.joins import asof_join

    def epochize(batch: pa.Table) -> pa.Table:
        # microsecond resolution on BOTH sides (epoch_us in the oracle):
        # second-truncation would create click/view timestamp ties with
        # ambiguous as-of winners
        us = pc_cast_us(batch.column("ts"))
        return batch.set_column(
            batch.schema.get_field_index("ts"), "ts", us)

    base = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_id", "user_id", "ts",
                                    "event_type", "value"])
    base = base.map_batches(epochize, batch_format="pyarrow",
                            **remote_args()).materialize()
    left = base.filter(expr="event_type == 'click'") \
        .drop_columns(["event_type", "value"])
    right = base.filter(expr="event_type == 'view'") \
        .drop_columns(["event_type", "event_id"])
    joined = asof_join(left, right, by="user_id", on="ts",
                       value_cols=["value"])
    pdf = joined.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.table({
        "event_id": pa.array(pdf["event_id"].astype(np.int64)),
        "user_id": pa.array(pdf["user_id"].astype(np.int64)),
        "view_value": pa.array(
            [None if pd.isna(v) else round(float(v), 6)
             for v in pdf["value_asof"]], type=pa.float64()),
    })


SQL_ASOF_JOIN_EVENTS = """
SELECT l.event_id, l.user_id,
       round(r.value, 6) AS view_value
FROM (SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, epoch_us(ts) AS t, value
      FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.t >= r.t
"""


WINDOW_S = 3600
HOP_S = 1800


def q_window_agg_events(sf_dir: str) -> pa.Table:
    """Hopping-window aggregate (functions/joins.py window_aggregate):
    1-hour windows hopping every 30 min; each event lands in 2 windows.
    Oracle: explicit offset cross-join in SQL."""
    import ray.data as rd

    from ..functions.joins import window_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "value"])

    def epochize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        secs = pc.cast(pc.floor(pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), 1_000_000)),
            pa.int64())
        return pa.table({"epoch_s": secs, "value": batch.column("value")})

    ds = ds.map_batches(epochize, batch_format="pyarrow", **remote_args())
    out = window_aggregate(ds, "epoch_s", WINDOW_S, HOP_S,
                           value_col="value")
    pdf = out.to_pandas().sort_values("window_start").reset_index(drop=True)
    return pa.table({
        "window_start": pa.array(pdf["window_start"].astype(np.int64)),
        "n_events": pa.array(pdf["n_events"].astype(np.int64)),
        "sum_value": pa.array([round(float(v), 6)
                               for v in pdf["sum_value"]],
                              type=pa.float64()),
    })


SQL_WINDOW_AGG_EVENTS = f"""
WITH offs(o) AS (VALUES (0), (1)),
e AS (SELECT CAST(floor(epoch(ts) / {HOP_S}) * {HOP_S} AS BIGINT) AS base,
             epoch(ts) AS t, value FROM events)
SELECT base - o * {HOP_S} AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM e CROSS JOIN offs
WHERE base - o * {HOP_S} + {WINDOW_S} > t
GROUP BY 1
"""


BPE_ISH_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
                   r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")


def q_bpe_token_counts(sf_dir: str) -> pa.Table:
    """BPE-ish token counting: GPT-2-style regex pre-tokenization
    (contraction pieces, space-prefixed letter/digit/punct runs —
    lookahead-free so RE2 handles it) counted per document, next to the
    whitespace count.  Both Ray (pyarrow RE2 count_substring_regex,
    fully vectorized) and the DuckDB oracle (regexp_extract_all, also
    RE2) run the SAME pattern in the same regex engine."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column("text"), "")
        bpe = pc.count_substring_regex(txt, pattern=BPE_ISH_PATTERN)
        ws = pc.count_substring_regex(txt, pattern=r"\S+")
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "bpe_tokens": bpe.cast(pa.int64()),
            "ws_tokens": ws.cast(pa.int64()),
        })

    pdf = (ds.map_batches(f, batch_format="pyarrow", **remote_args())
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


SQL_BPE_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace("'", "''")}')) AS BIGINT)
           AS bpe_tokens,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens
FROM documents
"""


MORE_QUERIES: Dict = {
    "bpe_token_counts": q_bpe_token_counts,
    "asof_join_events": q_asof_join_events,
    "window_agg_events": q_window_agg_events,
    "stemmed_doc_freqs_multilang": q_stemmed_doc_freqs_multilang,
    "fuzzy_match_count": q_fuzzy_match_count,
    "regex_match_count": q_regex_match_count,
    "stemmed_doc_freqs": q_stemmed_doc_freqs,
    "numeric_range_count": q_numeric_range_count,
    "field_scoped_counts": q_field_scoped_counts,
    "json_term_df": q_json_term_df,
    "json_numeric_range": q_json_numeric_range,
    "topk_bm25_filtered": q_topk_bm25_filtered,
    "count_matching": q_count_matching,
    "top_by_nchars": q_top_by_nchars,
    "phrase_topk": q_phrase_topk,
    "sessionize_events": q_sessionize_events,
    "snippets": q_snippets,
    "more_like_this": q_more_like_this,
}

MORE_ORACLE_SQL: Dict[str, str] = {
    "bpe_token_counts": SQL_BPE_TOKEN_COUNTS,
    "asof_join_events": SQL_ASOF_JOIN_EVENTS,
    "window_agg_events": SQL_WINDOW_AGG_EVENTS,
    "phrase_topk": _sql_phrase_topk(),
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "topk_bm25_filtered": SQL_TOPK_BM25_FILTERED,
    "count_matching": _sql_count_matching(),
    "top_by_nchars": SQL_TOP_BY_NCHARS,
    "json_term_df": SQL_JSON_TERM_DF,
    "json_numeric_range": SQL_JSON_NUMERIC_RANGE,
    "field_scoped_counts": SQL_FIELD_SCOPED_COUNTS,
    "numeric_range_count": SQL_NUMERIC_RANGE_COUNT,
    "fuzzy_match_count": SQL_FUZZY_MATCH_COUNT,
    "regex_match_count": SQL_REGEX_MATCH_COUNT,
    "snippets": _sql_snippets(),
    "more_like_this": _sql_more_like_this(),
    # no Snowball stemmer in this DuckDB build → the oracles are
    # checked-in golden fixtures (tools/make_goldens.py): expected tables
    # computed single-process with a direct per-doc Counter, independent
    # of the distributed index-build / groupby paths under test
    "stemmed_doc_freqs": _golden_sql("stemmed_doc_freqs"),
    "stemmed_doc_freqs_multilang": _golden_sql(
        "stemmed_doc_freqs_multilang"),
}
