"""Snowball English (Porter2) stemmer — pure Python.

Implements the published Snowball "english" algorithm
(snowballstem.org/algorithms/english/stemmer.html), the same algorithm the
reference uses through rust-stemmers
(/root/reference/src/tokenizer/stemmer.rs:63-120, Language::English).

Expects lowercased input (the tantivy chain puts LowerCaser before Stemmer).
Results are memoized because web text repeats terms heavily.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS and word[i] != "Y"


def _compute_r1_r2(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(n - 1):
            if _is_vowel(word, i) and not _is_vowel(word, i + 1):
                r1 = i + 2
                break
    r2 = n
    for i in range(r1, n - 1):
        if _is_vowel(word, i) and not _is_vowel(word, i + 1):
            r2 = i + 2
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """word ends in a short syllable:
    (a) non-vowel + vowel + non-vowel(not w,x,Y) at the end, or
    (b) vowel + non-vowel at the very beginning (word of length 2)."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _contains_vowel(word: str, start: int, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(start, end))


@lru_cache(maxsize=1 << 18)
def snowball_english_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    if not word.isascii() or not word.isalpha():
        # Snowball operates on a-z words; mixed tokens pass through
        # (rust-stemmers likewise leaves non-matching suffixes untouched,
        # but non-alpha chars break the vowel logic — pass through).
        if not all(c.isalpha() or c == "'" for c in word):
            return word

    w = word
    # strip leading apostrophe
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    exc = _EXCEPTIONS1.get(w)
    if exc is not None:
        return exc

    # mark consonant y as Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i - 1] != "Y":
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _compute_r1_r2(w)

    # Step 0: longest of 's  '  's
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("s") and not w.endswith(("us", "ss")):
        if _contains_vowel(w, 0, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w.lower()

    # Step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            # replacement applies only when the suffix lies in R1
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _contains_vowel(w, 0, len(stem)):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w = w + "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _ends_short_syllable(w) and r1 >= len(w):
                        w = w + "e"
                break

    # Step 1c: y/Y → i if preceded by a non-vowel that is not the first char
    if len(w) > 2 and w[-1] in "yY" and not _is_vowel(w, len(w) - 2):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, must be in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) >= 4 and w[-4] == "l":
                        w = w[:-1]  # ogi → og
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep  # type: ignore[operator]
            break

    # Step 3 (in R1; "ative" also requires R2)
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1]):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.lower()
