"""Ported reference query-grammar tests: the raw occur-tagged AST must
render exactly like the reference's UserInputAst Debug strings
(/root/reference/query-grammar/src/query_grammar.rs:1241-1430,
aggregate_infallible_expressions semantics)."""

import pytest

from tantivy_ray.search.query import (
    AllQuery, BooleanQuery, BoostQuery, EmptyQuery, RangeQuery, TermQuery)
from tantivy_ray.search.queryparser import QueryParser, ast_repr

P = QueryParser()


def rast(q: str) -> str:
    return ast_repr(P.parse_ast(q))


# (query, expected) pairs lifted verbatim from the reference tests
BINARY_OP_CASES = [
    ("a AND b", "(+a +b)"),
    ("a\nAND b", "(+a +b)"),
    ("a OR b", "(?a ?b)"),
    ("a OR b AND c", "(?a ?(+b +c))"),
    ("a AND b         AND c", "(+a +b +c)"),
    ("a OR b aaa", "(?a ?b *aaa)"),
    ("a AND b aaa", "(?(+a +b) *aaa)"),
    ("aaa a OR b ", "(*aaa ?a ?b)"),
    ("aaa ccc a OR b ", "(*aaa *ccc ?a ?b)"),
    ("aaa a AND b ", "(*aaa ?(+a +b))"),
    ("aaa ccc a AND b ", "(*aaa *ccc ?(+a +b))"),
]

MIXED_OCCUR_CASES = [
    ("+a OR +b", "(+a +b)"),
    ("a AND -b", "(+a -b)"),
    ("-a AND b", "(-a +b)"),
    ("a AND NOT b", "(+a +(-b))"),
    ("NOT a AND b", "(+(-a) +b)"),
    ("a AND NOT b AND c", "(+a +(-b) +c)"),
    ("a AND -b AND c", "(+a -b +c)"),
    ("a OR -b", "(?a ?(-b))"),
    ("-a OR b", "(?(-a) ?b)"),
    ("a OR NOT b", "(?a ?(-b))"),
    ("NOT a OR b", "(?(-a) ?b)"),
    ("a OR NOT b OR c", "(?a ?(-b) ?c)"),
    ("a OR -b OR c", "(?a ?(-b) ?c)"),
    ("a OR b +aaa", "(?a ?b +aaa)"),
    ("a AND b -aaa", "(?(+a +b) -aaa)"),
    ("+a OR +b aaa", "(+a +b *aaa)"),
    ("-a AND -b aaa", "(?(-a -b) *aaa)"),
    ("-aaa +ccc -a OR b ", "(-aaa +ccc ?(-a) ?b)"),
]

OTHER_CASES = [
    ("", "<emptyclause>"),
    ("NOT a", "(-a)"),
    ("NOTa", "NOTa"),
    ("a^3", "(a)^3"),
    ("a^3 b^2", "(*(a)^3 *(b)^2)"),
    ("a^1", "a"),
    ("www-form-encoded", "www-form-encoded"),
    ('"www-form-encoded"', '"www-form-encoded"'),
    ("'www-form-encoded'", "'www-form-encoded'"),
    ("mr james bo?d", "(*mr *james *bo?d)"),
    ("mr james bo*", "(*mr *james *bo*)"),
]

RANGE_CASES = [
    ("title: >a", '"title":{"a" TO "*"}'),
    ("title:>=a", '"title":["a" TO "*"}'),
    ("title: <a", '"title":{"*" TO "a"}'),
    ("title:<=a", '"title":{"*" TO "a"]'),
    ("title:<=bsd", '"title":{"*" TO "bsd"]'),
    ("weight: >70", '"weight":{"70" TO "*"}'),
    ("weight:>=70", '"weight":["70" TO "*"}'),
    ("weight: <70", '"weight":{"*" TO "70"}'),
    ("weight:<=70", '"weight":{"*" TO "70"]'),
    ("weight: >60.7", '"weight":{"60.7" TO "*"}'),
    ("weight: <= 70", '"weight":{"*" TO "70"]'),
    ("weight: <= 70.5", '"weight":{"*" TO "70.5"]'),
    (">a", '{"a" TO "*"}'),
    (">=a", '["a" TO "*"}'),
    ("<a", '{"*" TO "a"}'),
    ("<=a", '{"*" TO "a"]'),
    ("<=bsd", '{"*" TO "bsd"]'),
    ("(<=42)", '{"*" TO "42"]'),
    ("(<=42 )", '{"*" TO "42"]'),
    ("(age:>5)", '"age":{"5" TO "*"}'),
    ("(title:bar AND age:>12)",
     '(+"title":bar +"age":{"12" TO "*"})'),
]


@pytest.mark.parametrize("query,expected", BINARY_OP_CASES)
def test_binary_op(query, expected):
    assert rast(query) == expected


@pytest.mark.parametrize("query,expected", MIXED_OCCUR_CASES)
def test_mixed_bool_occur(query, expected):
    assert rast(query) == expected


@pytest.mark.parametrize("query,expected", OTHER_CASES)
def test_other_grammar(query, expected):
    assert rast(query) == expected


@pytest.mark.parametrize("query,expected", RANGE_CASES)
def test_elastic_ranges(query, expected):
    assert rast(query) == expected


class TestResolution:
    """Phase-2 semantics mirrored from query_parser.rs."""

    def test_all_negative_strict_raises(self):
        with pytest.raises(ValueError):
            P.parse("-a")
        with pytest.raises(ValueError):
            P.parse("NOT a")

    def test_all_negative_lenient_rescued(self):
        q, errs = P.parse_lenient("-a")
        assert errs == ["AllButQueryForbidden"]
        assert isinstance(q, BooleanQuery)
        assert any(isinstance(c, AllQuery) for c in q.should)
        assert [t.term for t in q.must_not] == ["a"]

    def test_nested_pure_negation_matches_nothing(self):
        # reference boolean_weight.rs: a clause with only MustNot children
        # is an EmptyScorer, so "a AND NOT b" matches no documents
        q = P.parse("a AND NOT b")
        assert isinstance(q, BooleanQuery)
        inner = q.must[1]
        assert isinstance(inner, BooleanQuery) and inner.must_not \
            and not inner.must and not inner.should

    def test_half_open_range_materializes(self):
        p = QueryParser(default_fields=["text"])
        q = p.parse(">box")
        assert isinstance(q, RangeQuery)
        assert q.lower == "box" and not q.include_lower and q.upper is None
        q = p.parse("<=dog")
        assert q.upper == "dog" and q.include_upper and q.lower is None

    def test_exclusive_lower_brace(self):
        q = P.parse("{box TO dog}")
        assert isinstance(q, RangeQuery)
        assert not q.include_lower and not q.include_upper

    def test_group_boost(self):
        q = P.parse("(a b)^2.5")
        assert isinstance(q, BoostQuery) and q.boost == 2.5
        assert isinstance(q.query, BooleanQuery)

    def test_empty(self):
        assert isinstance(P.parse(""), EmptyQuery)

    def test_plus_only_single_leaf_unwraps(self):
        # reference: single-element clause with non-MustNot occur unwraps
        q = P.parse("+abc")
        assert isinstance(q, TermQuery) and q.term == "abc"


SET_EXISTS_GROUP_CASES = [
    # reference test_parse_test_query_set / _other / exists tests
    ("abc: IN [a b c]", '"abc": IN ["a" "b" "c"]'),
    ("abc: IN [1]", '"abc": IN ["1"]'),
    ("abc: IN []", '"abc": IN []'),
    ("IN [1 2]", 'IN ["1" "2"]'),
    ("+(a b) +d", "(+(*a *b) +d)"),
    ("(+a +b) d", "(*(+a +b) *d)"),
    ("+abc:toto", '"abc":toto'),
    ("(+abc:toto -titi)", '(+"abc":toto -titi)'),
    ("-abc:toto", '(-"abc":toto)'),
    ("abc:a b", '(*"abc":a *b)'),
    ('abc:"a b"', '"abc":"a b"'),
    ("foo:[1 TO 5]", '"foo":["1" TO "5"]'),
    ("foo:(*A)", '"foo":*A'),
    ("*A", "*A"),
    ("(*A)", "*A"),
    ("foo:(A OR B)", '(?"foo":A ?"foo":B)'),
    ("foo:(A* OR B*)", '(?"foo":A* ?"foo":B*)'),
    ("foo:(*A OR *B)", '(?"foo":*A ?"foo":*B)'),
    ("foo:(/A.*/)", '"foo":/A.*/'),
    ("foo:(/A.*/ OR /B.*/)", '(?"foo":/A.*/ ?"foo":/B.*/)'),
    ("*", "*"),
    ("(*)", "*"),
    ("(* )", "*"),
    ("*^2", "(*)^2"),
    ("a:*", '$exists("a")'),
    ("a: *", '$exists("a")'),
    ("(a:*)", '$exists("a")'),
    ('"a b"*', '"a b"*'),
]


@pytest.mark.parametrize("query,expected", SET_EXISTS_GROUP_CASES)
def test_sets_exists_groups(query, expected):
    assert rast(query) == expected


class TestNewLeafResolution:
    def test_exists_materializes(self):
        from tantivy_ray.search.query import ExistsQuery

        q = QueryParser(default_fields=["text", "title"]).parse("title:*")
        assert isinstance(q, ExistsQuery) and q.field == "title"

    def test_field_set_materializes(self):
        from tantivy_ray.search.query import TermSetQuery

        p = QueryParser(default_fields=["text", "title"])
        q = p.parse("title: IN [Fox Dog]")
        assert isinstance(q, TermSetQuery)
        assert q.field == "title" and q.terms == ["fox", "dog"]

    def test_phrase_prefix_materializes(self):
        from tantivy_ray.search.query import PhrasePrefixQuery

        q = P.parse('"quick bro"*')
        assert isinstance(q, PhrasePrefixQuery)
        assert q.terms == ["quick", "bro"]

    def test_field_group_distributes(self):
        p = QueryParser(default_fields=["text", "title"])
        q = p.parse("title:(fox OR dog)")
        assert isinstance(q, BooleanQuery)
        assert [(t.term, t.field) for t in q.should] == \
            [("fox", "title"), ("dog", "title")]

    def test_field_regex_materializes(self):
        from tantivy_ray.search.query import RegexQuery

        p = QueryParser(default_fields=["text", "title"])
        q = p.parse("title:(/fo./)")
        assert isinstance(q, RegexQuery)
        assert q.pattern == "fo." and q.field == "title"


class TestFieldScopedEval:
    """End-to-end evaluation of the new field-scoped leaves over a real
    multifield index (exists, sets, distributed groups, regex, half-open
    ranges, phrase prefix)."""

    @pytest.fixture(scope="class")
    def searcher(self, ray_session, tmp_path_factory):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tantivy_ray.index.build import build_index
        from tantivy_ray.search import IndexSearcher

        d = tmp_path_factory.mktemp("qg_eval")
        rows = pd.DataFrame({
            "url": [f"u{i}" for i in range(6)],
            "text": ["the quick fox", "a lazy dog", "fox and dog",
                     "just words here", "dogged pursuit", "foxtrot dance"],
            "title": ["alpha fox", "beta", "gamma dog", None,
                      "delta fox", ""],
        })
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                       str(d / "docs.parquet"))
        ix = str(d / "ix")
        build_index(str(d / "docs.parquet"), ix, text_col="text",
                    extra_text_fields={"title": "default"},
                    record_positions=True)
        return IndexSearcher(ix)

    def _docs(self, s, q):
        from tantivy_ray.search.queryparser import QueryParser

        p = QueryParser(default_fields=["text", "title"])
        return sorted(int(h[2]) for h in s.search_query(p.parse(q), 10))

    def test_exists(self, searcher):
        # docs 3 (null title) and 5 (empty title) have no title tokens
        assert self._docs(searcher, "title:*") == [0, 1, 2, 4]

    def test_field_set(self, searcher):
        assert self._docs(searcher, "title: IN [fox dog]") == [0, 2, 4]

    def test_field_group(self, searcher):
        assert self._docs(searcher, "title:(alpha OR gamma)") == [0, 2]

    def test_field_regex(self, searcher):
        assert self._docs(searcher, "title:(/fo./)") == [0, 4]

    def test_half_open_range(self, searcher):
        # strictly-greater-than "fox": excludes the term itself
        assert self._docs(searcher, ">fox") == [0, 1, 3, 4, 5]

    def test_phrase_prefix(self, searcher):
        assert self._docs(searcher, '"quick fo"*') == [0]

    def test_field_regex_stat_terms_match_eval(self, searcher):
        # sharded parsed batches collect global dfs via collect_stat_terms;
        # a field-scoped regex must expand over the SAME field slice the
        # evaluator scores with
        from tantivy_ray.search.query import RegexQuery, collect_stat_terms

        q = RegexQuery("fo.", field="title")
        for rdr in searcher.readers:
            terms = collect_stat_terms(q, rdr)
            assert all(t.startswith("title\x00") for t in terms)

    def test_unprefixed_term_searches_all_default_fields(self, searcher):
        # reference query_parser.rs doc: with defaults [body, title] an
        # unprefixed term becomes (body:t OR title:t) — doc 4's "delta"
        # appears only in its title, doc 5's "dance" only in its text
        assert self._docs(searcher, "delta") == [4]
        assert self._docs(searcher, "dance") == [5]
        from tantivy_ray.search.query import BooleanQuery, TermQuery
        from tantivy_ray.search.queryparser import QueryParser

        q = QueryParser(default_fields=["text", "title"]).parse("fox")
        assert isinstance(q, BooleanQuery)
        assert [(c.term, c.field) for c in q.should] == \
            [("fox", None), ("fox", "title")]
        # single default field: plain primary TermQuery, as before
        q1 = QueryParser().parse("fox")
        assert isinstance(q1, TermQuery)


class TestParserFuzz:
    def test_parse_lenient_total(self):
        """The rewritten parser must be total: any input either parses
        to a Query or raises ValueError (unknown field / all-negative) —
        never an internal error."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tantivy_ray.search.query import Query

        @settings(max_examples=300, deadline=None)
        @given(st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)),
            max_size=60))
        def run(text):
            try:
                q, errs = P.parse_lenient(text)
            except ValueError:
                return
            assert isinstance(q, Query)

        run()

    def test_parse_grammar_soup(self):
        soup = ['AND', 'OR', 'NOT', '+', '-', '(', ')', '"a b', 'a"',
                '[x TO', 'TO y]', 'IN [', '/re', '^2', '~1', ':', '*',
                'f:', '>=', '"q w"*', "'s t'", 'a:*']
        import itertools
        from tantivy_ray.search.query import Query

        for combo in itertools.permutations(soup[:7], 3):
            text = " ".join(combo)
            try:
                q, _ = P.parse_lenient(text)
            except ValueError:
                continue
            assert isinstance(q, Query)
        for frag in soup:
            try:
                q, _ = P.parse_lenient(frag)
            except ValueError:
                continue
            assert isinstance(q, Query)
