"""Query parser — text → Query AST.

Re-expression of the reference's query-grammar surface
(/root/reference/query-grammar/src/user_input_ast.rs:11-30 UserInputLeaf =
Literal/All/Range/Set/Exists/Regex; src/query/query_parser/query_parser.rs):

    hello world             → disjunction (default) of term queries
    "hello world"           → PhraseQuery
    "hello world"~2         → PhraseQuery with slop
    +must -mustnot opt      → BooleanQuery occurs
    a AND b / a OR b / NOT  → boolean operators
    term^2.5                → BoostQuery
    fuzz~1                  → FuzzyTermQuery (distance)
    text:term               → field prefix (single text field: validated)
    [a TO b] / {a TO b}     → RangeQuery (inclusive / exclusive bounds)
    IN [a b c]              → TermSetQuery
    /regex/                 → RegexQuery
    *                       → AllQuery

``set_conjunction_by_default()`` switches bare-token combination to AND
(reference query_parser.rs:288).  Query text tokens run through the index
analyzer, like the reference's parser.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..analyzer import get_analyzer
from .query import (
    AllQuery,
    BooleanQuery,
    BoostQuery,
    EmptyQuery,
    FuzzyTermQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    RegexQuery,
    TermQuery,
    TermSetQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<quoted>"[^"]*"(~\d+)?)
  | (?P<range>[\[{][^\]}]*\s+TO\s+[^\]}]*[\]}])
  | (?P<set>IN\s*\[[^\]]*\])
  | (?P<regex>/[^/]+/)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b)
  | (?P<or>OR\b)
  | (?P<not>NOT\b)
  | (?P<word>[^\s()]+)
    """,
    re.VERBOSE,
)


class QueryParser:
    def __init__(self, analyzer: str = "default",
                 default_fields: Optional[List[str]] = None,
                 conjunction_by_default: bool = False):
        self.analyzer = analyzer
        self.fields = default_fields or ["text"]
        self.conjunction = conjunction_by_default

    def set_conjunction_by_default(self) -> "QueryParser":
        self.conjunction = True
        return self

    # --- public ---
    def parse(self, text: str) -> Query:
        tokens = self._lex(text)
        q, pos = self._parse_expr(tokens, 0)
        return q if q is not None else EmptyQuery()

    # --- lexing ---
    def _lex(self, text: str) -> List[Tuple[str, str]]:
        out = []
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind is None:
                kind = [k for k, v in m.groupdict().items() if v][0]
            out.append((kind, m.group(0)))
        return out

    # --- parsing (precedence: OR < AND < unary) ---
    def _parse_expr(self, toks, pos):
        left, pos = self._parse_and(toks, pos)
        items = [left]
        while pos < len(toks) and toks[pos][0] == "or":
            right, pos2 = self._parse_and(toks, pos + 1)
            items.append(right)
            pos = pos2
        items = [i for i in items if i is not None]
        if not items:
            return None, pos
        if len(items) == 1:
            return items[0], pos
        return BooleanQuery(should=items), pos

    def _parse_and(self, toks, pos):
        left, pos = self._parse_occur_seq(toks, pos)
        items = [left]
        while pos < len(toks) and toks[pos][0] == "and":
            right, pos2 = self._parse_occur_seq(toks, pos + 1)
            items.append(right)
            pos = pos2
        items = [i for i in items if i is not None]
        if not items:
            return None, pos
        if len(items) == 1:
            return items[0], pos
        # flatten pure-negation children: "a AND NOT b" → must=[a],
        # must_not=[b] (a negation-only clause matches nothing on its own)
        must, must_not = [], []
        for i in items:
            if isinstance(i, BooleanQuery) and i.must_not and not i.must \
                    and not i.should:
                must_not.extend(i.must_not)
            else:
                must.append(i)
        return BooleanQuery(must=must, must_not=must_not), pos

    def _parse_occur_seq(self, toks, pos):
        """A run of [+|-]atom tokens combined per occur flags."""
        must, should, must_not = [], [], []
        progressed = False
        while pos < len(toks) and toks[pos][0] not in ("or", "and", "rparen"):
            kind, raw = toks[pos]
            occur = "should"
            if kind == "not":
                occur = "must_not"
                pos += 1
                if pos >= len(toks):
                    break
                kind, raw = toks[pos]
            elif kind == "word" and raw.startswith("+"):
                occur, raw = "must", raw[1:]
            elif kind == "word" and raw.startswith("-") and len(raw) > 1:
                occur, raw = "must_not", raw[1:]
            q, pos = self._parse_atom(toks, pos, (kind, raw))
            progressed = True
            if q is None:
                continue
            {"must": must, "should": should, "must_not": must_not}[occur].append(q)
        if not progressed:
            return None, pos
        if self.conjunction and should and not must and not must_not:
            must, should = should, []
        if len(should) == 1 and not must and not must_not:
            return should[0], pos
        if len(must) == 1 and not should and not must_not:
            return must[0], pos
        if not (must or should or must_not):
            return None, pos
        return BooleanQuery(must=must, should=should, must_not=must_not), pos

    def _parse_atom(self, toks, pos, tok) -> Tuple[Optional[Query], int]:
        kind, raw = tok
        if kind == "lparen":
            q, pos = self._parse_expr(toks, pos + 1)
            if pos < len(toks) and toks[pos][0] == "rparen":
                pos += 1
            return q, pos
        if kind == "quoted":
            m = re.match(r'"([^"]*)"(~(\d+))?$', raw)
            body, slop = m.group(1), int(m.group(3) or 0)
            terms = self._analyze(body)
            if not terms:
                return None, pos + 1
            if len(terms) == 1 and slop == 0:
                return TermQuery(terms[0]), pos + 1
            return PhraseQuery(terms, slop), pos + 1
        if kind == "range":
            inc_up = raw.endswith("]")
            body = raw[1:-1]
            lo, hi = re.split(r"\s+TO\s+", body)
            lo = None if lo.strip() in ("*", "") else self._norm(lo.strip())
            hi = None if hi.strip() in ("*", "") else self._norm(hi.strip())
            return RangeQuery(lo, hi, include_upper=inc_up), pos + 1
        if kind == "set":
            body = raw[raw.index("[") + 1:-1]
            terms = [self._norm(w) for w in body.split() if w]
            return TermSetQuery(terms), pos + 1
        if kind == "regex":
            return RegexQuery(raw[1:-1]), pos + 1
        if kind == "word":
            return self._parse_word(raw), pos + 1
        return None, pos + 1

    def _parse_word(self, raw: str) -> Optional[Query]:
        if raw == "*":
            return AllQuery()
        # field prefix: first configured field is primary (unprefixed terms);
        # others route to field-scoped queries
        qfield = None
        if ":" in raw:
            fieldname, rest = raw.split(":", 1)
            if fieldname not in self.fields:
                raise ValueError(f"unknown field {fieldname!r}")
            if fieldname != self.fields[0]:
                qfield = fieldname
            raw = rest
        boost = None
        m = re.match(r"^(.*)\^(\d+(\.\d+)?)$", raw)
        if m:
            raw, boost = m.group(1), float(m.group(2))
        fuzzy = None
        m = re.match(r"^(.*)~(\d*)$", raw)
        if m:
            raw = m.group(1)
            fuzzy = int(m.group(2)) if m.group(2) else 1
        terms = self._analyze(raw)
        if not terms:
            return None
        if fuzzy is not None:
            q: Query = FuzzyTermQuery(terms[0], distance=fuzzy)
        elif len(terms) == 1:
            q = TermQuery(terms[0], field=qfield)
        else:
            # a single word that analyzes to several tokens → phrase
            q = PhraseQuery(terms, field=qfield)
        if boost is not None:
            q = BoostQuery(q, boost)
        return q

    def _analyze(self, text: str) -> List[str]:
        return [t.text for t in get_analyzer(self.analyzer).analyze(text)]

    def _norm(self, word: str) -> str:
        toks = self._analyze(word)
        return toks[0] if toks else word
