"""Snippet generation — best fragment + highlight ranges.

Re-expression of the reference's SnippetGenerator
(/root/reference/src/snippet/mod.rs:377): given a stored text and the
query's scored terms, choose the fragment (<= max_num_chars) whose sum of
DISTINCT contained term scores is maximal (first-best wins ties), and
return the fragment with highlight ranges / HTML (<b> marks, escaped).

Offsets here are Python character offsets into the stored string (the
reference uses byte offsets into UTF-8; both identify the same tokens).
"""

from __future__ import annotations

import html as _html
from typing import Dict, List, Optional, Sequence, Tuple

from ..analyzer import get_analyzer


class Snippet:
    __slots__ = ("fragment", "highlighted", "score")

    def __init__(self, fragment: str, highlighted: List[Tuple[int, int]],
                 score: float):
        self.fragment = fragment
        self.highlighted = highlighted  # (start, end) char ranges in fragment
        self.score = score

    def to_html(self) -> str:
        out = []
        prev = 0
        for s, e in self.highlighted:
            out.append(_html.escape(self.fragment[prev:s]))
            out.append("<b>" + _html.escape(self.fragment[s:e]) + "</b>")
            prev = e
        out.append(_html.escape(self.fragment[prev:]))
        return "".join(out)


class SnippetGenerator:
    def __init__(self, term_scores: Dict[str, float],
                 analyzer: str = "default", max_num_chars: int = 150):
        self.term_scores = dict(term_scores)
        self.analyzer = analyzer
        self.max_num_chars = max_num_chars

    @classmethod
    def from_terms(cls, terms: Sequence[str], searcher=None,
                   analyzer: str = "default",
                   max_num_chars: int = 150) -> "SnippetGenerator":
        """Score terms by idf when a searcher is given, else uniformly."""
        import numpy as np

        from ..bm25 import idf

        scores = {}
        for t in terms:
            if searcher is not None:
                df = searcher.doc_freq(t)
                scores[t] = float(
                    idf(max(df, 1), searcher.total_num_docs)) if df else 0.0
            else:
                scores[t] = 1.0
        return cls(scores, analyzer, max_num_chars)

    def snippet(self, text: str) -> Optional[Snippet]:
        ana = get_analyzer(self.analyzer)
        toks = ana.analyze(text)
        if not toks:
            return None
        # char offsets: re-derive from byte offsets when ascii, else remap
        if text.isascii():
            spans = [(t.offset_from, t.offset_to, t.text) for t in toks]
        else:
            # build byte→char map
            b2c = {}
            b = 0
            for ci, ch in enumerate(text):
                b2c[b] = ci
                b += len(ch.encode("utf-8"))
            b2c[b] = len(text)
            spans = [(b2c[t.offset_from], b2c[t.offset_to], t.text)
                     for t in toks]

        best_score = -1.0
        best_range: Optional[Tuple[int, int]] = None  # token index range
        n = len(spans)
        j = 0
        for i in range(n):
            # extend window while it fits max_num_chars
            if j < i:
                j = i
            while j + 1 <= n - 1 and spans[j + 1][1] - spans[i][0] <= self.max_num_chars:
                j += 1
            while j >= i and spans[j][1] - spans[i][0] > self.max_num_chars:
                j -= 1
            if j < i:
                continue
            seen = set()
            score = 0.0
            for k in range(i, j + 1):
                t = spans[k][2]
                if t in self.term_scores and t not in seen:
                    seen.add(t)
                    score += self.term_scores[t]
            if score > best_score:
                best_score = score
                best_range = (i, j)
        if best_range is None or best_score <= 0.0:
            # no matching term: leading fragment, no highlights
            frag = text[: self.max_num_chars]
            return Snippet(frag, [], 0.0)
        i, j = best_range
        start_c = spans[i][0]
        end_c = spans[j][1]
        frag = text[start_c:end_c]
        highlights = [
            (s - start_c, e - start_c)
            for s, e, t in spans[i:j + 1]
            if t in self.term_scores
        ]
        return Snippet(frag, highlights, best_score)
