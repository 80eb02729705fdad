"""Token filters — tantivy's filter chain semantics.

- ``LowerCaser``: ASCII fast path, else per-char Unicode lowercase WITHOUT
  the Greek final-sigma contextual rule
  (/root/reference/src/tokenizer/lower_caser.rs:44-66).
- ``RemoveLongFilter``: drops tokens whose UTF-8 byte length >= limit
  (keep iff ``len(bytes) < limit``; /root/reference/src/tokenizer/remove_long.rs:35-38).
- ``StopWordFilter``: drops tokens in a language stop list
  (/root/reference/src/tokenizer/stop_word_filter/).
- ``AlphaNumOnlyFilter``: keeps only tokens made entirely of alphanumerics
  (/root/reference/src/tokenizer/alphanum_only.rs:29).
- ``AsciiFoldingFilter``: folds diacritics/ligatures to ASCII using the
  full Lucene ``ASCIIFoldingFilter`` character table (1242 mappings,
  exact parity with /root/reference/src/tokenizer/ascii_folding_filter.rs:72;
  table data in ``ascii_folding_data.py``). Characters outside the table
  pass through unchanged, matching the reference.
- ``Stemmer``: Snowball (Porter2) English, implemented in ``stemmer.py``
  (/root/reference/src/tokenizer/stemmer.rs:12-31).
- ``SplitCompoundWords``: dictionary-driven compound splitting
  (/root/reference/src/tokenizer/split_compound_words.rs:46).

Filters transform ``List[Token]`` in place of tantivy's stream wrappers;
dropped tokens leave position gaps (positions were assigned by the
tokenizer), matching the reference's composition order.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set

from .ascii_folding_data import FOLD_TABLE
from .stemmer import snowball_english_stem
from .tokenizers import Token

# Lucene/tantivy classic English stop list (33 words) —
# reference src/tokenizer/stop_word_filter/ (English set).
ENGLISH_STOP_WORDS: Set[str] = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}


def lowercase_token_text(text: str) -> str:
    """tantivy LowerCaser: per-char lowercase, no final-sigma context."""
    if text.isascii():
        return text.lower()
    if "Σ" in text:  # capital sigma: avoid str.lower()'s contextual ς
        return "".join(c.lower() for c in text)
    return text.lower()


class LowerCaser:
    def apply(self, tokens: List[Token]) -> List[Token]:
        for t in tokens:
            t.text = lowercase_token_text(t.text)
        return tokens


class RemoveLongFilter:
    def __init__(self, length_limit: int = 40):
        self.length_limit = length_limit

    def _keep(self, text: str) -> bool:
        return len(text.encode("utf-8")) < self.length_limit

    def apply(self, tokens: List[Token]) -> List[Token]:
        return [t for t in tokens if self._keep(t.text)]


_STOP_LANG_BY_CODE = {
    "da": "danish", "nl": "dutch", "fi": "finnish", "fr": "french",
    "de": "german", "hu": "hungarian", "it": "italian", "no": "norwegian",
    "pt": "portuguese", "ru": "russian", "es": "spanish", "sv": "swedish",
}


class StopWordFilter:
    def __init__(self, words: Optional[Sequence[str]] = None, language: str = "english"):
        if isinstance(words, str):
            # StopWordFilter("en") means the language, not a one-string
            # word list (mirrors the reference's new(Language) API);
            # iterating the string would silently stop single LETTERS
            words, language = None, words
        if words is None:
            if language in ("english", "en"):
                # Lucene EnglishAnalyzer list (reference stop_word_filter/
                # mod.rs:42-48)
                words = ENGLISH_STOP_WORDS
            else:
                # the reference's 12 other shipped lists (NLTK corpus data,
                # stop_word_filter/stopwords.rs) — full membership parity
                from .stopwords import STOPWORD_LISTS

                name = _STOP_LANG_BY_CODE.get(language, language)
                if name not in STOPWORD_LISTS:
                    # reference StopWordFilter::new returns None for other
                    # languages; we raise so the misroute is loud
                    raise ValueError(
                        f"no built-in stop list for {language!r}; pass words="
                    )
                words = STOPWORD_LISTS[name]
        self.words = frozenset(words)

    def apply(self, tokens: List[Token]) -> List[Token]:
        return [t for t in tokens if t.text not in self.words]


class AlphaNumOnlyFilter:
    def apply(self, tokens: List[Token]) -> List[Token]:
        return [t for t in tokens if t.text.isalnum()]


def ascii_fold(text: str) -> str:
    """Fold to ASCII per the Lucene table; non-table chars pass through
    (reference ascii_folding_filter.rs:52 ``to_ascii``)."""
    if text.isascii():
        return text
    return text.translate(FOLD_TABLE)


class AsciiFoldingFilter:
    def apply(self, tokens: List[Token]) -> List[Token]:
        for t in tokens:
            t.text = ascii_fold(t.text)
        return tokens


class Stemmer:
    """Snowball stemmer (reference src/tokenizer/stemmer.rs:63-120 via
    rust-stemmers).  Implemented natively for all 18 reference languages
    (English here as Porter2; the rest in ``snowball_langs.py``) from the
    published algorithm descriptions; unknown languages raise."""

    def __init__(self, language: str = "english"):
        if language in ("english", "en"):
            self.language = "english"
            self._stem = snowball_english_stem
        else:
            from .snowball_langs import LANGUAGE_STEMMERS

            fn = LANGUAGE_STEMMERS.get(language)
            if fn is None:
                raise NotImplementedError(
                    f"stemmer language {language!r} not available in this "
                    "build (english/german/french/spanish/russian only)")
            self.language = language
            self._stem = fn

    def stem(self, word: str) -> str:
        return self._stem(word)

    def apply(self, tokens: List[Token]) -> List[Token]:
        for t in tokens:
            t.text = self._stem(t.text)
        return tokens


class SplitCompoundWords:
    """Greedy dictionary-driven compound splitting: if a token can be written
    as a concatenation of dictionary words, emit the parts (same position),
    else keep the token (reference uses aho-corasick; semantics: only emits
    the split when the WHOLE token is covered)."""

    def __init__(self, dictionary: Sequence[str]):
        self.words = frozenset(w for w in dictionary if w)
        self.max_len = max((len(w) for w in self.words), default=0)

    def _split(self, text: str) -> Optional[List[str]]:
        n = len(text)
        # dp[i] = split of text[:i] or None
        dp: List[Optional[List[str]]] = [None] * (n + 1)
        dp[0] = []
        for i in range(1, n + 1):
            lo = max(0, i - self.max_len)
            for j in range(i - 1, lo - 1, -1):
                if dp[j] is not None and text[j:i] in self.words:
                    dp[i] = dp[j] + [text[j:i]]  # type: ignore[operator]
                    break
        return dp[n] if dp[n] else None

    def apply(self, tokens: List[Token]) -> List[Token]:
        out: List[Token] = []
        for t in tokens:
            parts = self._split(t.text)
            if parts and len(parts) > 1:
                for p in parts:
                    out.append(Token(p, t.position, t.offset_from, t.offset_to))
            else:
                out.append(t)
        return out
