"""MoreLikeThisQuery — weighted term query from a document.

Re-expression of the reference (/root/reference/src/query/more_like_this/
more_like_this.rs:28): tokenize the source document, filter terms by
min_term_frequency / min_doc_frequency / max_doc_frequency / word-length
bounds / stop words, score each candidate tf * idf, keep the top
``max_query_terms``, and build a Should-of-boosted-TermQueries where each
boost is the term's score divided by the best score (Lucene's normalized
boosting, which the reference follows)."""

from __future__ import annotations

from collections import Counter
from typing import Optional, Sequence


from ..analyzer import get_analyzer
from ..bm25 import idf
from .query import BooleanQuery, BoostQuery, Query, TermQuery


class MoreLikeThis:
    def __init__(
        self,
        min_term_frequency: int = 1,
        max_query_terms: int = 25,
        min_doc_frequency: int = 1,
        max_doc_frequency: Optional[int] = None,
        min_word_length: int = 0,
        max_word_length: int = 0,
        stop_words: Optional[Sequence[str]] = None,
        boost_factor: float = 1.0,
    ):
        self.min_term_frequency = min_term_frequency
        self.max_query_terms = max_query_terms
        self.min_doc_frequency = min_doc_frequency
        self.max_doc_frequency = max_doc_frequency
        self.min_word_length = min_word_length
        self.max_word_length = max_word_length
        self.stop_words = frozenset(stop_words or ())
        self.boost_factor = boost_factor

    def query_for_text(self, text: str, searcher) -> Query:
        ana = get_analyzer(searcher.manifest.analyzer)
        tfs = Counter(t.text for t in ana.analyze(text))
        total_docs = searcher.total_num_docs
        scored = []
        for term, tf in tfs.items():
            if tf < self.min_term_frequency:
                continue
            if self.min_word_length and len(term) < self.min_word_length:
                continue
            if self.max_word_length and len(term) > self.max_word_length:
                continue
            if term in self.stop_words:
                continue
            df = searcher.doc_freq(term)
            if df < self.min_doc_frequency:
                continue
            if self.max_doc_frequency is not None and df > self.max_doc_frequency:
                continue
            score = float(tf) * float(idf(df, total_docs))
            scored.append((score, term))
        scored.sort(key=lambda s: (-s[0], s[1]))
        scored = scored[: self.max_query_terms]
        if not scored:
            return BooleanQuery()
        best = scored[0][0] or 1.0
        shoulds = [
            BoostQuery(TermQuery(term), self.boost_factor * score / best)
            for score, term in scored
        ]
        return BooleanQuery(should=shoulds)

    def search(self, text: str, searcher, k: int = 10):
        return searcher.search_query(self.query_for_text(text, searcher), k)
