"""Automaton x sorted-term-dict intersection (search/automaton.py).

Parity oracles: the round-1 banded DP (`_levenshtein_leq`) and python
`re.fullmatch` — the same semantics the DuckDB gate queries
(levenshtein() / regexp_full_match) encode.  Plus the VERDICT round-2
criterion: sub-linear term-dict probes on a >=1M-term synthetic vocab
(reference intersects a Levenshtein DFA with the FST,
src/query/fuzzy_query.rs:1-123, instead of scanning the vocabulary).
"""

import random
import re

import pyarrow as pa
import pytest

from tantivy_ray.search.automaton import (
    LevenshteinAutomaton,
    RegexAutomaton,
    UnsupportedRegex,
    intersect_sorted_terms,
)
from tantivy_ray.search.query import _levenshtein_leq


def _vocab(n=4000, alpha="abcdz", seed=7, max_len=8):
    rnd = random.Random(seed)
    return sorted({
        "".join(rnd.choice(alpha) for _ in range(rnd.randint(0, max_len)))
        for _ in range(n)
    })


class TestLevenshteinParity:
    def test_fullmatch_parity_random(self):
        vocab = _vocab()
        arr = pa.array(vocab, type=pa.string())
        rnd = random.Random(11)
        for _ in range(150):
            q = "".join(rnd.choice("abcdz") for _ in range(rnd.randint(0, 6)))
            k = rnd.randint(0, 2)
            tr = rnd.random() < 0.5
            aut = LevenshteinAutomaton(q, k, transposition=tr)
            got = [vocab[i] for i in intersect_sorted_terms(arr, aut)]
            exp = [t for t in vocab if _levenshtein_leq(q, t, k, tr)]
            assert got == exp, (q, k, tr)

    def test_prefix_parity_random(self):
        # prefix semantics: ANY prefix of the term within distance k
        # (reference FuzzyTermQuery::new_prefix / build_prefix_dfa)
        vocab = _vocab()
        arr = pa.array(vocab, type=pa.string())
        rnd = random.Random(13)

        def brute(q, t, k, tr):
            return any(_levenshtein_leq(q, t[:m], k, tr)
                       for m in range(min(len(t), len(q) + k) + 1))

        for _ in range(100):
            q = "".join(rnd.choice("abcdz") for _ in range(rnd.randint(1, 5)))
            k = rnd.randint(0, 2)
            tr = rnd.random() < 0.5
            aut = LevenshteinAutomaton(q, k, transposition=tr, prefix=True)
            got = {vocab[i] for i in intersect_sorted_terms(arr, aut)}
            exp = {t for t in vocab if brute(q, t, k, tr)}
            assert got == exp, (q, k, tr)

    def test_unicode_and_empty(self):
        vocab = sorted({"", "a", "ä", "äb", "über", "uber", "zÿ"})
        arr = pa.array(vocab, type=pa.string())
        aut = LevenshteinAutomaton("über", 1, transposition=True)
        got = {vocab[i] for i in intersect_sorted_terms(arr, aut)}
        exp = {t for t in vocab if _levenshtein_leq("über", t, 1, True)}
        assert got == exp


class TestRegexParity:
    @pytest.mark.parametrize("pat", [
        "s.an", "w.+dow", "zzz+", "a(b|c)*d", "[ab]{2,4}", "ab?c",
        "(ab|cd)+", "a.{1,3}z", "[^a]bc", "x*", "a|b|", "(?:ab)+c?",
        "[a-c]z{2}", "a{0,2}b",
    ])
    def test_known_patterns(self, pat):
        vocab = _vocab()
        arr = pa.array(vocab, type=pa.string())
        aut = RegexAutomaton(pat)
        got = [vocab[i] for i in intersect_sorted_terms(arr, aut)]
        rx = re.compile(pat)
        exp = [t for t in vocab if rx.fullmatch(t)]
        assert got == exp

    def test_random_patterns(self):
        vocab = _vocab()
        arr = pa.array(vocab, type=pa.string())
        rnd = random.Random(23)

        def rand_regex(depth=0):
            r = rnd.random()
            if depth > 2 or r < 0.4:
                return rnd.choice(list("abcd") + [".", "[ab]", "[^c]"])
            if r < 0.6:
                return rand_regex(depth + 1) + rand_regex(depth + 1)
            if r < 0.75:
                return f"({rand_regex(depth + 1)}|{rand_regex(depth + 1)})"
            return f"({rand_regex(depth + 1)})" + rnd.choice("*+?")

        for _ in range(120):
            pat = rand_regex()
            aut = RegexAutomaton(pat)
            got = {vocab[i] for i in intersect_sorted_terms(arr, aut)}
            rx = re.compile(pat)
            exp = {t for t in vocab if rx.fullmatch(t)}
            assert got == exp, pat

    def test_unsupported_raises(self):
        for pat in [r"(a)\1", r"a(?=b)", r"^abc$", r"a{1000}", r"(?m)a",
                    r"[\b]", r"\baz"]:
            with pytest.raises(UnsupportedRegex):
                RegexAutomaton(pat)


class TestPredefinedClasses:
    """Round-3: \\d \\w \\s (+ negations, in-class forms) and leading
    (?i)/(?s) flags compile into the automaton instead of falling back to
    the O(vocab) `re` scan (reference src/query/regex_query.rs:57 —
    tantivy-fst regex supports these classes)."""

    VOCAB = sorted({
        "a1", "ab", "a_b", "x9z", "42", "007", "tab", "TAB", "TaB",
        "Tab9", "under_score", "n o", "tab\ttab", "line\nfeed",
        "٣٤", "foo٣", "Ü", "ü", "üb", "ÜB", "mixed42x", "_", "-", "a-b",
        "", "zz z",
    })

    @pytest.mark.parametrize("pat", [
        r"\d+", r"\w+", r"\s", r"\S+", r"\D+", r"\W",
        r"[a-z]\w*", r"a\db?", r"[\d]+", r"[\w-]+", r"[^\d]+",
        r"[\s\d]+", r"\w+\s\w+", r"tab\s?tab", r"(?i)tab", r"(?i)TaB\d?",
        r"(?i)[a-c]a?b", r"(?s).+", r"(?is)ü.?", r"\d{2,3}",
    ])
    def test_parity_with_re(self, pat):
        arr = pa.array(self.VOCAB, type=pa.string())
        aut = RegexAutomaton(pat)  # must NOT raise UnsupportedRegex
        got = [self.VOCAB[i] for i in intersect_sorted_terms(arr, aut)]
        rx = re.compile(pat)
        exp = [t for t in self.VOCAB if rx.fullmatch(t)]
        assert got == exp, pat


class TestSublinearProbes:
    """VERDICT round-2 'done' criterion: sub-linear term-dict probes on a
    >=1M-term synthetic vocabulary."""

    @pytest.fixture(scope="class")
    def big_arr(self):
        # ~1.05M distinct terms, realistic-ish shape (base word + suffix)
        rnd = random.Random(5)
        bases = ["".join(rnd.choice("abcdefghijklmnopqrstuvwxyz")
                         for _ in range(rnd.randint(3, 9)))
                 for _ in range(1300)]
        vocab = {f"{b}{i:04d}" for b in bases for i in range(900)}
        vocab.update(bases)
        vocab.update(["table", "tables", "tablet", "tabel", "window",
                      "windows", "span", "scan", "stan"])
        vocab = sorted(vocab)
        assert len(vocab) >= 1_000_000
        return vocab, pa.array(vocab, type=pa.string())

    def test_fuzzy_sublinear(self, big_arr):
        vocab, arr = big_arr
        counter = [0]
        aut = LevenshteinAutomaton("tabel", 1, transposition=False)
        got = [vocab[i] for i in intersect_sorted_terms(arr, aut, counter)]
        exp = [t for t in vocab if _levenshtein_leq("tabel", t, 1, False)]
        assert got == exp
        # full scan would be >=1M probes; the trie walk does a few thousand
        assert counter[0] < len(vocab) // 50, counter[0]

    def test_fuzzy_distance2_sublinear(self, big_arr):
        vocab, arr = big_arr
        counter = [0]
        aut = LevenshteinAutomaton("window", 2, transposition=True)
        got = [vocab[i] for i in intersect_sorted_terms(arr, aut, counter)]
        exp = [t for t in vocab if _levenshtein_leq("window", t, 2, True)]
        assert got == exp
        assert counter[0] < len(vocab) // 10, counter[0]

    def test_regex_sublinear(self, big_arr):
        vocab, arr = big_arr
        counter = [0]
        aut = RegexAutomaton("wind[oa]w(s|ing)?")
        got = [vocab[i] for i in intersect_sorted_terms(arr, aut, counter)]
        rx = re.compile("wind[oa]w(s|ing)?")
        exp = [t for t in vocab if rx.fullmatch(t)]
        assert got == exp
        assert counter[0] < len(vocab) // 100, counter[0]

    def test_digit_class_sublinear(self, big_arr):
        """VERDICT round-3 'done' criterion: a \\d+-style pattern compiles
        (no O(vocab) `re` fallback) and probes stay sub-linear."""
        vocab, arr = big_arr
        base = next(t[:-4] for t in vocab if t[-4:].isdigit())
        pat = re.escape(base) + r"\d+"
        counter = [0]
        aut = RegexAutomaton(pat)
        got = [vocab[i] for i in intersect_sorted_terms(arr, aut, counter)]
        rx = re.compile(pat)
        exp = [t for t in vocab if rx.fullmatch(t)]
        assert got == exp and len(got) >= 900
        # probes ~ matched subtree, not vocabulary size
        assert counter[0] < len(vocab) // 100, counter[0]


class TestEndToEndGate:
    """expand_fuzzy / expand_regex through a real SegmentReader still
    agree with the brute-force semantics (gate queries stay green)."""

    def test_expand_via_reader(self, tmp_path):
        from tantivy_ray.index.manifest import IndexManifest, write_manifest
        from tantivy_ray.index.segment import build_segment_from_table
        from tantivy_ray.search import IndexSearcher
        from tantivy_ray.search.query import (FuzzyTermQuery, expand_fuzzy,
                                              expand_regex)

        docs = pa.table({
            "url": [f"d{i}" for i in range(6)],
            "text": [
                "the quick brown fox", "a quack duck", "quicker than light",
                "windows and tables", "span scan stan", "zzz zzzz sleepy",
            ],
        })
        meta = build_segment_from_table(docs, 0, str(tmp_path))
        write_manifest(str(tmp_path), IndexManifest(segments=[meta]))
        s = IndexSearcher(str(tmp_path))
        r = s.readers[0]
        all_terms = r.terms()
        got = expand_fuzzy(r, FuzzyTermQuery("quick", 1, transposition=False))
        exp = [t for t in all_terms
               if _levenshtein_leq("quick", t, 1, False)]
        assert got == exp and "quick" in got and "quack" in got

        got = expand_regex(r, "s.an")
        assert got == [t for t in all_terms if re.fullmatch("s.an", t)]
        assert set(got) == {"scan", "span", "stan"}

        got = expand_regex(r, "zzz+")
        assert set(got) == {"zzz", "zzzz"}


class TestIgnorecaseCasefold:
    """ADVICE r3: (?i) must use full casefolding like re.IGNORECASE —
    'ſ' (U+017F) folds to 's' under casefold() but not lower()."""

    CASES = [
        ("(?i)strasse", ["ſtraſse", "STRASSE", "strasse", "straße"]),
        ("(?i)s", ["ſ", "S", "s", "t"]),
        ("(?i)[a-z]+", ["ſſ", "ABC", "abc", "123"]),
        ("(?i)[k-m]", ["K", "K", "ſ"]),
    ]

    def test_matches_re_fullmatch(self):
        import re

        from tantivy_ray.search.automaton import RegexAutomaton

        for pat, terms in self.CASES:
            a = RegexAutomaton(pat)
            for t in terms:
                want = re.fullmatch(pat, t) is not None
                st = a.start()
                for ch in t:
                    if st is None:
                        break
                    st = a.step(st, ch)
                got = st is not None and a.is_match(st)
                assert got == want, (pat, t, got, want)
