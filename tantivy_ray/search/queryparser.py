"""Query parser — text → Query AST, in the reference's two-phase shape.

Phase 1 (grammar): lex + parse to a RAW user-input AST with occur tags,
using the reference's exact binary-expression occur-composition
(/root/reference/query-grammar/src/query_grammar.rs
``aggregate_infallible_expressions``): a query is a flat sequence of
(operator-before, occur, atom) elements; AND appends to the current
group with default occur Must, OR starts a new Should group, implicit
elements start a new group whose default occur derives from the NEXT
operator, and a MustNot leaf in a Should context synthesizes
``?(-x)``.  This reproduces the reference's documented edge semantics,
e.g. ``a AND b aaa`` → ``(?(+a +b) *aaa)``, ``-a OR b`` → ``(?(-a) ?b)``.

Phase 2 (resolution, the reference's query_parser.rs): raw words run
through the index analyzer; ``None`` occur resolves to the default
(Should, or Must after ``set_conjunction_by_default()`` —
query_parser.rs:288); an all-negative query is rejected
(``AllButQueryForbidden``, query_parser.rs:422) by the strict ``parse``
and rescued by ``parse_lenient`` with a Should(AllQuery) clause, like
the reference's lenient path (``make_non_negative``).

Surface (user_input_ast.rs:11-30 Literal/All/Range/Set/Exists/Regex):

    hello world             → disjunction (default) of term queries
    "hello world"           → PhraseQuery          "…"~2 → slop
    +must -mustnot opt      → occur prefixes       NOT x → unary (-x)
    a AND b / a OR b        → boolean operators (reference precedence)
    term^2.5 / (a b)^2      → BoostQuery
    fuzz~1                  → FuzzyTermQuery (distance)
    text:term               → field prefix (validated)
    [a TO b] / {a TO b}     → RangeQuery (bounds incl. / excl.)
    >a >=a <a <=a           → elastic-style half-open ranges
    IN [a b c]              → TermSetQuery
    /regex/                 → RegexQuery
    *                       → AllQuery

Nested pure-negation subclauses (``a AND NOT b`` → ``(+a +(-b))``)
keep the reference's scorer semantics: a clause with only MustNot
children matches NOTHING (boolean_weight.rs — EmptyScorer), so
``a AND NOT b`` matches no documents; write ``a -b`` for exclusion.
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
    ExistsQuery,
    FuzzyTermQuery,
    PhrasePrefixQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    RegexQuery,
    TermQuery,
    TermSetQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<fieldquoted>[^\s():]+:"[^"]*"(~\d+|\*)?)
  | (?P<fieldrange>[^\s():]+:[\[{][^\]}]*\s+TO\s+[^\]}]*[\]}])
  | (?P<quoted>"[^"]*"(~\d+|\*)?)
  | (?P<squoted>'[^']*'(~\d+|\*)?)
  | (?P<range>[\[{][^\]}]*\s+TO\s+[^\]}]*[\]}])
  | (?P<set>IN\s*\[[^\]]*\])
  | (?P<regex>/[^/]+/)
  | (?P<cmp>(>=|<=|>|<)\s*[^\s()]+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b)
  | (?P<or>OR\b)
  | (?P<not>NOT\b)
  | (?P<word>[^\s()]+)
    """,
    re.VERBOSE,
)

# occur tags on raw-AST clause children; None = unset (reference "*")
MUST, SHOULD, MUST_NOT = "+", "?", "-"

# raw AST nodes:
#   ("clause", [(occur|None, node), ...])
#   ("boost", node, factor)
#   ("leaf", kind, payload)  with kinds word/phrase/range/set/regex/all


def _clause(items):
    return ("clause", items)


def _unary_not(node):
    return _clause([(MUST_NOT, node)])


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

    # ------------------------------------------------------------------
    # public
    # ------------------------------------------------------------------
    def parse(self, text: str) -> Query:
        """Strict parse — raises on unknown fields and on all-negative
        queries (the reference's AllButQueryForbidden)."""
        q, errors = self._parse_impl(text, lenient=False)
        return q

    def parse_lenient(self, text: str) -> Tuple[Query, List[str]]:
        """Lenient parse — rescues an all-negative query with a
        Should(AllQuery) clause (reference ``make_non_negative``) and
        returns (query, error messages)."""
        return self._parse_impl(text, lenient=True)

    def parse_ast(self, text: str):
        """Phase-1 only: the raw occur-tagged AST (pre-analysis), the
        analog of the reference's UserInputAst (used by grammar tests)."""
        toks = self._lex(text)
        ast, pos = self._parse_sequence(toks, 0)
        return ast

    def _parse_impl(self, text: str, lenient: bool):
        ast = self.parse_ast(text)
        q = self._materialize(ast)
        if q is None:
            return EmptyQuery(), []
        errors: List[str] = []
        if not isinstance(q, EmptyQuery) and _all_negative(q):
            if not lenient:
                raise ValueError(
                    "all-negative query matches nothing "
                    "(reference AllButQueryForbidden)")
            errors.append("AllButQueryForbidden")
            q = _make_non_negative(q)
        return q, errors

    # ------------------------------------------------------------------
    # lexing
    # ------------------------------------------------------------------
    def _lex(self, text: str) -> List[Tuple[str, str]]:
        out = []
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind is None:  # pragma: no cover
                kind = [k for k, v in m.groupdict().items() if v][0]
            out.append((kind, m.group(0)))
        return out

    # ------------------------------------------------------------------
    # phase 1: sequence of (binop, occur, atom) → occur-composed clause
    # ------------------------------------------------------------------
    def _parse_sequence(self, toks, pos):
        """Parse until end / rparen, then run the reference's
        aggregate_infallible_expressions over the element list."""
        leafs = []  # (binop 'and'/'or'/None, occur|None, node)
        while pos < len(toks) and toks[pos][0] != "rparen":
            binop = None
            if toks[pos][0] in ("and", "or"):
                binop = toks[pos][0]
                pos += 1
                if pos >= len(toks) or toks[pos][0] == "rparen":
                    break  # trailing operator: lenient-drop
            occur = None
            kind, raw = toks[pos]
            if kind == "word" and raw in ("+", "-"):
                occur = MUST if raw == "+" else MUST_NOT
                pos += 1
                if pos >= len(toks) or toks[pos][0] == "rparen":
                    break
                kind, raw = toks[pos]
            elif kind == "word" and raw.startswith("+") and len(raw) > 1:
                occur, raw = MUST, raw[1:]
            elif kind == "word" and raw.startswith("-") and len(raw) > 1:
                occur, raw = MUST_NOT, raw[1:]
            if kind == "not":
                pos += 1
                if pos >= len(toks) or toks[pos][0] == "rparen":
                    # dangling NOT: reference lenient parses the term "NOT"
                    leafs.append((binop, occur, ("leaf", "word", "NOT")))
                    break
                node, pos = self._parse_atom(toks, pos, toks[pos])
                if node is not None:
                    leafs.append((binop, occur, _unary_not(node)))
                continue
            node, pos = self._parse_atom(toks, pos, (kind, raw))
            if node is not None:
                leafs.append((binop, occur, node))
        return _aggregate(leafs), pos

    def _parse_atom(self, toks, pos, tok):
        kind, raw = tok
        if kind in ("fieldquoted", "fieldrange"):
            fieldname, rest = raw.split(":", 1)
            inner_kind = "quoted" if kind == "fieldquoted" else "range"
            node, pos = self._parse_atom(toks, pos, (inner_kind, rest))
            return _attach_field(node, fieldname), pos
        # detached field prefix: "title: >a" / "title: bar"
        if kind == "word" and raw.endswith(":") and len(raw) > 1 \
                and pos + 1 < len(toks) \
                and toks[pos + 1][0] in ("word", "cmp", "range", "quoted",
                                         "set", "regex", "lparen"):
            nkind, nraw = toks[pos + 1]
            node, pos2 = self._parse_atom(toks, pos + 1, (nkind, nraw))
            return _attach_field(node, raw[:-1]), pos2
        if kind == "lparen":
            node, pos = self._parse_sequence(toks, pos + 1)
            if pos < len(toks) and toks[pos][0] == "rparen":
                pos += 1
            # group boost: "(a b)^2.5"
            if pos < len(toks) and toks[pos][0] == "word" \
                    and re.fullmatch(r"\^\d+(\.\d+)?", toks[pos][1]):
                node = ("boost", node, float(toks[pos][1][1:]))
                pos += 1
            return node, pos
        if kind in ("quoted", "squoted"):
            d = '"' if kind == "quoted" else "'"
            m = re.match(rf"{d}([^{d}]*){d}(~(\d+)|(\*))?$", raw)
            return ("leaf", "phrase",
                    {"body": m.group(1), "slop": int(m.group(3) or 0),
                     "prefix": m.group(4) is not None,
                     "delimiter": d,
                     "field": None}), pos + 1
        if kind == "range":
            inc_lo = raw.startswith("[")
            inc_up = raw.endswith("]")
            lo, hi = re.split(r"\s+TO\s+", raw[1:-1])
            return ("leaf", "range",
                    {"lower": lo.strip(), "upper": hi.strip(),
                     "include_lower": inc_lo, "include_upper": inc_up,
                     "field": None}), pos + 1
        if kind == "cmp":
            m = re.match(r"(>=|<=|>|<)\s*(.*)$", raw)
            op, val = m.group(1), m.group(2)
            spec = {"lower": "*", "upper": "*", "include_lower": False,
                    "include_upper": False, "field": None}
            if op in (">", ">="):
                spec["lower"] = val
                spec["include_lower"] = op == ">="
            else:
                spec["upper"] = val
                spec["include_upper"] = op == "<="
            return ("leaf", "range", spec), pos + 1
        if kind == "set":
            body = raw[raw.index("[") + 1:-1]
            return ("leaf", "set",
                    {"terms": [w for w in body.split() if w],
                     "field": None}), pos + 1
        if kind == "regex":
            return ("leaf", "regex",
                    {"pattern": raw[1:-1], "field": None}), pos + 1
        if kind == "word":
            if raw == "*":
                return ("leaf", "all", None), pos + 1
            # field:* → ExistsQuery (reference exists_infallible)
            m = re.match(r"^(.+?):\*$", raw)
            if m:
                return ("leaf", "exists", m.group(1)), pos + 1
            # attached field:cmp range ("age:>5", "weight:<=70")
            m = re.match(r"^(.+?):(>=|<=|>|<)(.+)$", raw)
            if m:
                fieldname, op, val = m.groups()
                spec = {"lower": "*", "upper": "*", "include_lower": False,
                        "include_upper": False, "field": fieldname}
                if op in (">", ">="):
                    spec["lower"] = val
                    spec["include_lower"] = op == ">="
                else:
                    spec["upper"] = val
                    spec["include_upper"] = op == "<="
                return ("leaf", "range", spec), pos + 1
            # boost suffix lifts to the grammar level ("a^3" → (a)^3;
            # the reference drops a neutral ^1)
            m = re.match(r"^(.+)\^(\d+(\.\d+)?)$", raw)
            if m:
                boost = float(m.group(2))
                base = m.group(1)
                leaf = (("leaf", "all", None) if base == "*"
                        else ("leaf", "word", base))
                return (leaf if boost == 1.0
                        else ("boost", leaf, boost)), pos + 1
            return ("leaf", "word", raw), pos + 1
        return None, pos + 1

    # ------------------------------------------------------------------
    # phase 2: analysis + materialization to Query objects
    # ------------------------------------------------------------------
    def _materialize(self, ast) -> Optional[Query]:
        tag = ast[0]
        if tag == "boost":
            sub = self._materialize(ast[1])
            return None if sub is None else BoostQuery(sub, ast[2])
        if tag == "clause":
            default = MUST if self.conjunction else SHOULD
            must, should, must_not = [], [], []
            for occur, child in ast[1]:
                q = self._materialize(child)
                if q is None:
                    continue  # analyzed away: reference trim_ast
                {MUST: must, SHOULD: should, MUST_NOT: must_not}[
                    occur or default].append(q)
            if not (must or should or must_not):
                return None
            if len(should) == 1 and not must and not must_not:
                return should[0]
            if len(must) == 1 and not should and not must_not:
                return must[0]
            return BooleanQuery(must=must, should=should,
                                must_not=must_not)
        kind, payload = ast[1], ast[2]
        if kind == "all":
            return AllQuery()
        if kind == "exists":
            return ExistsQuery(field=self._scoped(payload))
        if kind == "regex":
            return RegexQuery(payload["pattern"],
                              field=self._scoped(payload.get("field")))
        if kind == "set":
            return TermSetQuery([self._norm(w) for w in payload["terms"]],
                                field=self._scoped(payload.get("field")))
        if kind == "range":
            lo = payload["lower"]
            hi = payload["upper"]
            lo = None if lo in ("*", "") else self._norm(lo)
            hi = None if hi in ("*", "") else self._norm(hi)
            return RangeQuery(
                lo, hi,
                include_upper=payload["include_upper"],
                include_lower=payload["include_lower"] or lo is None,
                field=self._scoped(payload.get("field")))
        if kind == "phrase":
            terms = self._analyze(payload["body"])
            slop = payload["slop"]
            if not terms:
                return None
            if payload.get("prefix"):
                if payload.get("field") is not None \
                        and self._scoped(payload["field"]) is not None:
                    raise ValueError(
                        "field-scoped phrase-prefix queries are not "
                        "supported (primary field only)")
                return PhrasePrefixQuery(terms)
            if payload.get("field") is None:
                # unprefixed literal → one disjunction over the default
                # fields (reference query_parser.rs doc: "Barack Obama"
                # with defaults body+title → (body:t OR title:t) per term)
                if len(terms) == 1 and slop == 0:
                    return self._distribute(
                        lambda f: TermQuery(terms[0], field=f))
                return self._distribute(
                    lambda f: PhraseQuery(terms, slop, field=f))
            if len(terms) == 1 and slop == 0:
                return TermQuery(terms[0],
                                 field=self._scoped(payload["field"]))
            return PhraseQuery(terms, slop,
                               field=self._scoped(payload["field"]))
        if kind == "word":
            return self._parse_word(payload)
        return None  # pragma: no cover

    def _distribute(self, build) -> Query:
        """Unprefixed literals search EVERY default field (reference
        query_parser.rs: a term without a field becomes a disjunction
        over the default fields); with one default field this is just
        the primary-field query."""
        if len(self.fields) == 1:
            return build(None)
        subs = [build(None)] + [build(f) for f in self.fields[1:]]
        return BooleanQuery(should=subs)

    def _scoped(self, fieldname: Optional[str]) -> Optional[str]:
        if fieldname is None:
            return None
        if fieldname not in self.fields:
            raise ValueError(f"unknown field {fieldname!r}")
        return None if fieldname == self.fields[0] else fieldname

    def _parse_word(self, raw: str) -> Optional[Query]:
        qfield = None
        explicit_field = False
        if ":" in raw:
            fieldname, rest = raw.split(":", 1)
            qfield = self._scoped(fieldname)
            explicit_field = True
            if fieldname in self.fields:
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
            # FuzzyTermQuery carries no field — primary only.  Reject a
            # non-primary scope loudly (matching the field-scoped
            # phrase-prefix rejection) instead of silently searching the
            # wrong field.
            if explicit_field and qfield is not None:
                raise ValueError(
                    "field-scoped fuzzy queries are not supported "
                    "(primary field only)")
            q: Query = FuzzyTermQuery(terms[0], distance=fuzzy)
        elif explicit_field:
            q = (TermQuery(terms[0], field=qfield) if len(terms) == 1
                 else PhraseQuery(terms, field=qfield))
        elif len(terms) == 1:
            q = self._distribute(lambda f: TermQuery(terms[0], field=f))
        else:
            # a single word that analyzes to several tokens → phrase
            q = self._distribute(lambda f: PhraseQuery(terms, field=f))
        if boost is not None:
            q = BoostQuery(q, boost)
        return q

    def _analyze(self, text: str) -> List[str]:
        return [t.text for t in get_analyzer(self.analyzer).analyze(text)]

    def _norm(self, word: str) -> str:
        toks = self._analyze(word)
        return toks[0] if toks else word


def _attach_field(node, fieldname: str):
    """Distribute a field prefix over an atom — including groups, the
    reference's ``foo:(A OR B)`` → ``(?"foo":A ?"foo":B)``."""
    if node is None:
        return None
    tag = node[0]
    if tag == "clause":
        return ("clause", [(occur, _attach_field(sub, fieldname))
                           for occur, sub in node[1]])
    if tag == "boost":
        return ("boost", _attach_field(node[1], fieldname), node[2])
    kind, payload = node[1], node[2]
    if kind == "word":
        return ("leaf", "word", f"{fieldname}:{payload}")
    if kind == "all":
        # "field: *" → exists (reference exists_infallible)
        return ("leaf", "exists", fieldname)
    if kind in ("range", "phrase", "set", "regex"):
        payload = dict(payload)
        payload["field"] = fieldname
        return ("leaf", kind, payload)
    return node


# ---------------------------------------------------------------------------
# the reference's occur-composition (aggregate_infallible_expressions)
# ---------------------------------------------------------------------------

def _aggregate(leafs):
    """query_grammar.rs:938-1040, verbatim semantics."""
    if not leafs:
        return _clause([])
    clauses = []  # list of groups; group = [(occur|None, node)]

    def or_element(occur, node, default):
        if occur == MUST_NOT and default == SHOULD:
            # MustNot in an OR context synthesizes ?(-x)
            return (SHOULD, _unary_not(node))
        return (occur or default, node)

    for (prev_op, occur, node), (next_op, _, _) in zip(leafs, leafs[1:]):
        if prev_op == "and":
            item = (occur or MUST, node)
            if clauses:
                clauses[-1].append(item)
            else:
                clauses.append([item])
        elif prev_op == "or":
            default = MUST if next_op == "and" else SHOULD
            clauses.append([or_element(occur, node, default)])
        else:
            if next_op == "and":
                default = MUST
            elif next_op == "or":
                default = SHOULD
            else:
                default = None
            clauses.append([or_element(occur, node, default)])

    last_op, last_occur, last_node = leafs[-1]
    if last_op == "and":
        item = (last_occur or MUST, last_node)
        if clauses:
            clauses[-1].append(item)
        else:
            clauses.append([item])
    elif last_op == "or":
        if last_occur == MUST_NOT:
            clauses.append([(SHOULD, _unary_not(last_node))])
        else:
            clauses.append([(last_occur or SHOULD, last_node)])
    else:
        clauses.append([(last_occur, last_node)])

    if len(clauses) == 1:
        group = clauses[0]
        if len(group) == 1 and group[0][0] != MUST_NOT:
            return group[0][1]
        return _clause(group)
    final = []
    for group in clauses:
        if len(group) == 1:
            final.append(group[0])
        else:
            final.append((SHOULD, _clause(group)))
    return _clause(final)


def ast_repr(ast) -> str:
    """Render a raw AST in the reference's Debug format — "(?a ?(+b +c))",
    occur None → '*', boost → "(a)^3" — for the ported grammar tests."""
    tag = ast[0]
    if tag == "clause":
        items = ast[1]
        if not items:
            return "<emptyclause>"
        return "(" + " ".join(
            (occur or "*") + ast_repr(sub) for occur, sub in items) + ")"
    if tag == "boost":
        f = ast[2]
        fs = str(int(f)) if f == int(f) else str(f)
        return f"({ast_repr(ast[1])})^{fs}"
    kind, payload = ast[1], ast[2]
    if kind == "word":
        if ":" in payload:
            fieldname, rest = payload.split(":", 1)
            return f'"{fieldname}":{rest}'
        return payload
    if kind == "phrase":
        d = payload.get("delimiter", '"')
        body = f'{d}{payload["body"]}{d}'
        if payload.get("field"):
            body = f'"{payload["field"]}":{body}'
        if payload["slop"]:
            body += f'~{payload["slop"]}'
        elif payload.get("prefix"):
            body += "*"
        return body
    if kind == "range":
        lo_b = "[" if payload["include_lower"] else "{"
        hi_b = "]" if payload["include_upper"] else "}"
        body = (f'{lo_b}"{payload["lower"]}" TO "{payload["upper"]}"{hi_b}')
        if payload.get("field"):
            body = f'"{payload["field"]}":{body}'
        return body
    if kind == "all":
        return "*"
    if kind == "exists":
        return f'$exists("{payload}")'
    if kind == "set":
        body = "IN [" + " ".join(f'"{w}"' for w in payload["terms"]) + "]"
        if payload.get("field"):
            body = f'"{payload["field"]}": {body}'
        return body
    if kind == "regex":
        body = f'/{payload["pattern"]}/'
        if payload.get("field"):
            body = f'"{payload["field"]}":{body}'
        return body
    return "?"  # pragma: no cover


def _all_negative(q: Query) -> bool:
    """query_parser.rs:221 — True when every path is MustNot."""
    if isinstance(q, BoostQuery):
        return _all_negative(q.query)
    if isinstance(q, BooleanQuery):
        pos = list(q.must) + list(q.should)
        if not pos and not q.must_not:
            return False
        return all(_all_negative(c) for c in pos) if pos or q.must_not \
            else False
    return False


def _make_non_negative(q: Query) -> Query:
    """query_parser.rs:232 — rescue an all-negative query by adding a
    Should(AllQuery) clause."""
    if isinstance(q, BoostQuery):
        return BoostQuery(_make_non_negative(q.query), q.boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(must=list(q.must),
                            should=list(q.should) + [AllQuery()],
                            must_not=list(q.must_not))
    return q  # pragma: no cover
