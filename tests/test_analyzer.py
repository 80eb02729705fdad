"""Golden tests for the analyzer chain.

Vectors come from the reference's own unit tests:
- src/tokenizer/simple_tokenizer.rs:71-79
- src/tokenizer/lower_caser.rs:83-93
- src/tokenizer/remove_long.rs tests
"""

import numpy as np
import pyarrow as pa
import pytest

from tantivy_ray.analyzer import (
    FacetTokenizer,
    NgramTokenizer,
    RawTokenizer,
    SimpleTokenizer,
    Token,
    WhitespaceTokenizer,
    analyze_batch,
    get_analyzer,
    lowercase_token_text,
    snowball_english_stem,
)


def toks(analyzer_name, text):
    return get_analyzer(analyzer_name).analyze(text)


class TestSimpleTokenizer:
    def test_reference_vector(self):
        # reference src/tokenizer/simple_tokenizer.rs:71-79
        ts = SimpleTokenizer().tokenize("Hello, happy tax payer!")
        assert [(t.text, t.position, t.offset_from, t.offset_to) for t in ts] == [
            ("Hello", 0, 0, 5),
            ("happy", 1, 7, 12),
            ("tax", 2, 13, 16),
            ("payer", 3, 17, 22),
        ]

    def test_unicode_byte_offsets(self):
        ts = SimpleTokenizer().tokenize("Русский текст")
        assert [t.text for t in ts] == ["Русский", "текст"]
        # "Русский" = 7 cyrillic chars = 14 utf-8 bytes
        assert (ts[0].offset_from, ts[0].offset_to) == (0, 14)
        assert (ts[1].offset_from, ts[1].offset_to) == (15, 25)

    def test_underscore_splits(self):
        ts = SimpleTokenizer().tokenize("a_b")
        assert [t.text for t in ts] == ["a", "b"]

    def test_empty(self):
        assert SimpleTokenizer().tokenize("") == []
        assert SimpleTokenizer().tokenize("...!") == []


class TestLowerCaser:
    def test_reference_vectors(self):
        # reference src/tokenizer/lower_caser.rs:83-93
        assert [t.text for t in toks("default", "Tree")] == ["tree"]
        assert [t.text for t in toks("default", "Русский текст")] == [
            "русский",
            "текст",
        ]

    def test_no_final_sigma(self):
        # tantivy deliberately skips the final-sigma contextual rule
        assert lowercase_token_text("ΟΔΟΣ") == "οδοσ"
        assert "ΟΔΟΣ".lower() == "οδος"  # python's contextual behavior differs

    def test_existing_final_sigma_preserved(self):
        assert lowercase_token_text("οδός") == "οδός"


class TestRemoveLong:
    def test_default_chain_40_bytes(self):
        text = "hello " + "a" * 39 + " " + "b" * 40 + " world"
        out = [t.text for t in toks("default", text)]
        assert out == ["hello", "a" * 39, "world"]

    def test_positions_keep_gaps(self):
        text = ("x" * 50) + " alpha beta"
        ts = toks("default", text)
        assert [(t.text, t.position) for t in ts] == [("alpha", 1), ("beta", 2)]


class TestOtherTokenizers:
    def test_whitespace(self):
        ts = WhitespaceTokenizer().tokenize("Hello, tax!  payer")
        assert [t.text for t in ts] == ["Hello,", "tax!", "payer"]

    def test_raw(self):
        ts = RawTokenizer().tokenize("Hello, happy tax payer!")
        assert len(ts) == 1 and ts[0].text == "Hello, happy tax payer!"
        assert ts[0].position == 0

    def test_ngram(self):
        ts = NgramTokenizer(2, 3).tokenize("abcd")
        assert [t.text for t in ts] == ["ab", "abc", "bc", "bcd", "cd"]
        ts = NgramTokenizer(2, 3, prefix_only=True).tokenize("abcd")
        assert [t.text for t in ts] == ["ab", "abc"]

    def test_facet(self):
        ts = FacetTokenizer().tokenize("/a/b/c")
        assert [t.text for t in ts] == ["/a", "/a/b", "/a/b/c"]


class TestStemmer:
    VECTORS = [
        ("running", "run"),
        ("hopping", "hop"),
        ("hoping", "hope"),
        ("ties", "tie"),
        ("cries", "cri"),
        ("flies", "fli"),
        ("caresses", "caress"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("cats", "cat"),
        ("gas", "gas"),
        ("this", "this"),
        ("dying", "die"),
        ("lying", "lie"),
        ("news", "news"),
        ("skies", "sky"),
        ("sky", "sky"),
        ("early", "earli"),
        ("only", "onli"),
        ("generate", "generat"),
        ("generates", "generat"),
        ("generating", "generat"),
        ("general", "general"),
        ("generic", "generic"),
        ("communication", "communic"),
        ("national", "nation"),
        ("rational", "ration"),
        ("conditional", "condit"),
        ("conflated", "conflat"),
        ("triplicate", "triplic"),
        ("dependent", "depend"),
        ("adjustment", "adjust"),
        ("adoption", "adopt"),
        ("happiness", "happi"),
        ("goodness", "good"),
        ("sensitivity", "sensit"),
        ("activate", "activ"),
        ("effective", "effect"),
        ("bowled", "bowl"),
        ("controlled", "control"),
        ("rolling", "roll"),
        ("sized", "size"),
        ("exceed", "exceed"),
        ("succeeding", "succeed"),
        ("inning", "inning"),
        ("knightly", "knight"),
        ("meetings", "meet"),
    ]

    @pytest.mark.parametrize("word,expected", VECTORS)
    def test_vectors(self, word, expected):
        assert snowball_english_stem(word) == expected

    def test_short_words_unchanged(self):
        for w in ("a", "ab", "be", "is"):
            assert snowball_english_stem(w) == w

    def test_en_stem_chain(self):
        out = [t.text for t in toks("en_stem", "The RUNNING dogs were Meeting")]
        assert out == ["the", "run", "dog", "were", "meet"]


class TestArrowBatchPath:
    """The vectorized path must agree with the exact per-string path."""

    CORPUS = [
        "Hello, happy tax payer!",
        "Русский текст",
        "",
        "a_b c-d e.f",
        "x" * 50 + " alpha beta",
        "The quick brown fox JUMPED over 42 lazy dogs",
        "ΟΔΟΣ και οδός",
        None,
        "...!",
        "key agg row scan slow fast table value part hash",
    ]

    @pytest.mark.parametrize("name", ["default", "en_stem", "whitespace", "raw"])
    def test_matches_reference_path(self, name):
        arr = pa.array(self.CORPUS, type=pa.string())
        out = analyze_batch(arr, name, with_positions=True)
        ana = get_analyzer(name)
        for i, text in enumerate(self.CORPUS):
            expected = ana.analyze(text or "")
            got_tokens = out.tokens[i].as_py()
            assert got_tokens == [t.text for t in expected], (name, text)
            got_pos = out.positions[i].as_py()
            assert got_pos == [t.position for t in expected], (name, text)
            assert out.num_tokens[i] == len(expected)

    def test_num_tokens_counts_post_filter(self):
        arr = pa.array(["x" * 50 + " alpha beta"])
        out = analyze_batch(arr, "default")
        assert out.num_tokens[0] == 2
