"""AsciiFoldingFilter full-table parity.

The reference embeds the Apache Lucene ASCIIFoldingFilter table
(/root/reference/src/tokenizer/ascii_folding_filter.rs:72, 1242 mappings);
``ascii_folding_data.FOLD_TABLE`` carries the same public data.  Spot
vectors below are drawn from the reference's own test corpus
(ascii_folding_filter.rs:2390+) and Lucene's TestASCIIFoldingFilter.
"""

import pytest

from tantivy_ray.analyzer.ascii_folding_data import FOLD_TABLE
from tantivy_ray.analyzer.filters import AsciiFoldingFilter, ascii_fold
from tantivy_ray.analyzer.tokenizers import Token


def test_table_shape():
    # 1242 non-ASCII codepoints, every replacement pure ASCII (possibly
    # multi-char: ligatures/digraphs), no identity mappings.
    assert len(FOLD_TABLE) == 1242
    assert all(cp > 0x7F for cp in FOLD_TABLE)
    assert all(v.isascii() and len(v) >= 1 for v in FOLD_TABLE.values())
    assert all(1 <= len(v) <= 4 for v in FOLD_TABLE.values())


SPOT_VECTORS = [
    # accents / diacritics (reference test "Des mot clés À LA CHAÎNE")
    ("Des mot clés À LA CHAÎNE", "Des mot cles A LA CHAINE"),
    ("Ràmon", "Ramon"),
    ("über", "uber"),
    ("señor", "senor"),
    # ligatures and digraphs
    ("œuvre", "oeuvre"),
    ("Æon", "AEon"),
    ("straße", "strasse"),
    ("ﬁle ﬃx", "file ffix"),
    ("Ǆungla", "DZungla"),
    ("ĳs", "ijs"),
    # stroked / non-decomposable letters (NFKD cannot derive these)
    ("Løvø", "Lovo"),
    ("Đakovo", "Dakovo"),
    ("ħello", "hello"),
    ("ŋam", "nam"),
    ("ınıt", "init"),
    ("Þorn ðis", "TH" + "orn dis"),
    # reference maps U+0149 to plain "n" (its own test corpus)
    ("ŉ", "n"),
    # enclosed / fullwidth forms
    ("Ⓐⓑ", "Ab"),
    ("ＦＵＬＬ　ｗｉｄｅ", "FULL　wide"),  # ideographic space NOT in table
    ("⑴⑵", "(1)(2)"),
    ("⒈", "1."),
    ("⒜", "(a)"),
    # punctuation folds
    ("‘quoted’", "'quoted'"),
    ("“double”", '"double"'),
    ("en–dash—em", "en-dash-em"),
    ("⁅q⁆", "[q]"),
    ("⁈", "?!"),
    ("１＋２＝３", "1+2=3"),
    ("＼＾＠", "\\^@"),
    # superscripts/subscripts that ARE in the table
    ("x²y₃ⁿ", "x2y3n"),
    # not in the table: pass through unchanged
    ("馬", "馬"),
    ("русский", "русский"),
    ("ελληνικά", "ελληνικά"),
    ("©½", "©½"),
]


@pytest.mark.parametrize("raw,want", SPOT_VECTORS)
def test_spot_vectors(raw, want):
    assert ascii_fold(raw) == want


def test_non_table_chars_pass_through():
    # The filter folds exactly the table's domain; NFKD-foldable chars
    # outside it (e.g. MODIFIER LETTER SMALL H U+02B0, COPYRIGHT ©,
    # VULGAR FRACTION ½) must survive untouched.
    for ch in ("ʰ", "©", "½", "¨", "¯"):
        assert ch not in [chr(c) for c in FOLD_TABLE]
        assert ascii_fold(ch) == ch


def test_idempotent_and_ascii_fixed_point():
    samples = [chr(cp) for cp in list(FOLD_TABLE)[::37]] + ["mixed Àŉ馬ﬃ"]
    for s in samples:
        once = ascii_fold(s)
        assert ascii_fold(once) == once
    assert ascii_fold("plain ascii!") == "plain ascii!"


def test_filter_applies_to_tokens():
    toks = [Token(text="Ràmon", position=0, offset_from=0, offset_to=5),
            Token(text="plain", position=1, offset_from=6, offset_to=11)]
    out = AsciiFoldingFilter().apply(toks)
    assert [t.text for t in out] == ["Ramon", "plain"]
    # positions/offsets untouched (folding changes text only)
    assert [(t.position, t.offset_from, t.offset_to) for t in out] == [
        (0, 0, 5), (1, 6, 11)]


def test_every_group_sample_folds():
    # One representative per distinct replacement string: folding each
    # single-char input must yield exactly its table replacement.
    seen = {}
    for cp, repl in FOLD_TABLE.items():
        seen.setdefault(repl, cp)
    assert len(seen) == 229
    for repl, cp in seen.items():
        assert ascii_fold(chr(cp)) == repl
